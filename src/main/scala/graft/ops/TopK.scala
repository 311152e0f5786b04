package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Approximate heavy hitters (the ClickHouse `topK(k)(x)` analog) via
  * the SpaceSaving summary (Metwally, Agrawal, El Abbadi 2005 —
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams"), packaged as a typed [[Aggregator]] so Spark runs it as a
  * partial+final object-hash aggregate: each task folds its partition
  * into a bounded `capacity`-entry summary and ONLY those summaries
  * shuffle.
  *
  * Why not exact `groupBy(token).count().orderBy.limit(k)` (which is
  * `vocab_topk`)? Exact needs one shuffle keyed on every distinct
  * item — at 100 TB of text the distinct-token shuffle is billions of
  * keys. SpaceSaving shuffles `capacity` rows per task regardless of
  * input size, the classic summary-not-data trade. Guarantees: counts
  * are overestimates by at most the summary's eviction floor at entry
  * (tracked per item in `err_max`); and when `capacity >= distinct
  * items` no eviction ever happens, so the summary is EXACT — which is
  * how `vocab_topk_approx` stays oracle-paired on the test corpus
  * while TopKSpec pins the genuinely-approximate small-capacity
  * regime.
  *
  * Merge of two summaries (the distributed step, after Cafaro et al.'s
  * parallel SpaceSaving): every stream item was inserted into its
  * summary, so a key absent from one side was either never seen there
  * or dropped at a trim — its count there is bounded by that side's
  * eviction floor, and it contributes (floor, floor) to (count, err);
  * a never-trimmed side's floor is 0, i.e. exact. The merged map is
  * re-trimmed to `capacity`, folding dropped estimates into the new
  * floor.
  *
  * Capacity guidance: when summaries get TRIMMED at merge time
  * (distinct items per task ≫ capacity), the conservative floors
  * compound across sequential merges and absent items' upper-bound
  * estimates inflate — the (est, est-err) bounds stay valid, but
  * RANKING quality degrades. Size capacity well above both k and the
  * expected per-task distinct count (ClickHouse sizes its reserved
  * slots at a multiple of k for the same reason); `err_max = 0` on
  * every output row certifies the whole answer is exact.
  */
object TopK {

  /** item -> (estimated count, max overestimate), plus one reserved
    * sentinel entry carrying the summary's eviction floor (the max
    * estimate ever dropped at a trim — an upper bound on any absent
    * item's count). Item keys containing U+0000 are not supported. */
  type Buf = Map[String, (Long, Long)]

  private val FloorKey = "\u0000floor"

  private def floorOf(b: Buf): Long =
    b.get(FloorKey).map(_._1).getOrElse(0L)

  /** Keep the `cap` highest-estimate live entries; fold every dropped
    * estimate into the floor sentinel. Dropped ests <= kept ests, so
    * the new floor stays a sound upper bound for ALL absent items. */
  private def trim(b: Buf, cap: Int): Buf = {
    val live = (b - FloorKey).toSeq
    if (live.length <= cap) b
    else {
      val sorted = live.sortBy { case (k, (c, _)) => (-c, k) }
      val (kept, dropped) = sorted.splitAt(cap)
      val newFloor = math.max(floorOf(b), dropped.head._2._1)
      kept.toMap.updated(FloorKey, (newFloor, 0L))
    }
  }

  /** Weighted SpaceSaving (the ClickHouse topKWeighted shape): each
    * occurrence contributes its weight instead of 1. All bounds carry
    * over with "count" read as "weight sum"; [[SpaceSaving]] is the
    * weight-1 special case. Weights must be non-negative.
    *
    * Eviction is LAZY-BATCHED: newcomers enter at (floor + w, floor)
    * and the buffer is trimmed back to `capacity` only when it
    * reaches 2x capacity — amortized O(log capacity) per row, where
    * the textbook evict-one-min is O(capacity) per NEW item and
    * measured 90+ s for one 600 k-row pass at high eviction rates
    * (every arriving key a potential eviction). Bounds are identical
    * in form and tighter in practice: the floor is the max DROPPED
    * estimate, not the min kept one. */
  class WeightedSpaceSaving(capacity: Int)
      extends Aggregator[(String, Long), Buf, Seq[(String, Long, Long)]] {
    require(capacity > 0)

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, xw: (String, Long)): Buf = {
      val (x, w) = xw
      b.get(x) match {
        case Some((c, e)) => b.updated(x, (c + w, e))
        case None =>
          val f = floorOf(b)
          val b2 = b.updated(x, (f + w, f))
          // b2.size counts the sentinel too — harmless slack of one
          if (b2.size <= 2 * capacity) b2 else trim(b2, capacity)
      }
    }

    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, capacity)

    override def finish(r: Buf): Seq[(String, Long, Long)] =
      finishBuf(r)

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  class SpaceSaving(capacity: Int)
      extends Aggregator[String, Buf, Seq[(String, Long, Long)]] {
    require(capacity > 0)

    private val weighted = new WeightedSpaceSaving(capacity)

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, x: String): Buf =
      weighted.reduce(b, (x, 1L))

    override def merge(a: Buf, b: Buf): Buf = mergeBufs(a, b, capacity)

    override def finish(r: Buf): Seq[(String, Long, Long)] =
      finishBuf(r)

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

  private def mergeBufs(a: Buf, b: Buf, capacity: Int): Buf = {
    // Every stream item was inserted into its summary, so an absent
    // key can only have been dropped at a trim — the sentinel floor
    // bounds its count exactly (tighter than the min-kept-estimate
    // heuristic, which also charges keys the summary never saw).
    val fa = floorOf(a)
    val fb = floorOf(b)
    val merged = ((a.keySet ++ b.keySet) - FloorKey).iterator.map { k =>
      val (ca, ea) = a.getOrElse(k, (fa, fa))
      val (cb, eb) = b.getOrElse(k, (fb, fb))
      k -> (ca + cb, ea + eb)
    }.toMap
    val withFloor =
      if (fa + fb > 0) merged.updated(FloorKey, (fa + fb, 0L))
      else merged
    trim(withFloor, capacity)
  }

  private def finishBuf(r: Buf): Seq[(String, Long, Long)] =
    (r - FloorKey).toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, _) => (-c, k) }

  /** Top-`k` most frequent values of `itemCol` with bounded state:
    * columns (term, cnt_est, err_max), counts exact iff no eviction
    * occurred (err_max = 0 certifies a row's count is exact).
    */
  def topK(items: DataFrame, itemCol: Column, k: Int,
      capacity: Int = 4096): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]
    ds.select(new SpaceSaving(capacity).toColumn)
      .toDF("tk")
      .select(explode(col("tk")).as("e"))
      .select(col("e._1").as("term"),
        col("e._2").as("cnt_est"),
        col("e._3").as("err_max"))
      .orderBy(col("cnt_est").desc, col("term"))
      .limit(k)
  }

  /** Weighted top-`k` (ClickHouse topKWeighted analog): same bounded
    * state and output shape as [[topK]], with `cnt_est` the estimated
    * WEIGHT SUM per item — e.g. revenue heavy hitters instead of
    * frequency heavy hitters. Exact iff no eviction occurred. */
  def topKWeighted(items: DataFrame, itemCol: Column, weightCol: Column,
      k: Int, capacity: Int = 4096): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val ds = items
      .select(itemCol.cast("string").as("_1"),
        weightCol.cast("long").as("_2"))
      .filter(col("_1").isNotNull && col("_2").isNotNull)
      .as[(String, Long)]
    ds.select(new WeightedSpaceSaving(capacity).toColumn)
      .toDF("tk")
      .select(explode(col("tk")).as("e"))
      .select(col("e._1").as("term"),
        col("e._2").as("cnt_est"),
        col("e._3").as("err_max"))
      .orderBy(col("cnt_est").desc, col("term"))
      .limit(k)
  }
}
