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
  * are overestimates by at most the summary's min count at eviction
  * (tracked per item in `err_max`); any item with true frequency
  * > N/capacity is guaranteed present; and when `capacity >= distinct
  * items` no eviction ever happens, so the summary is EXACT — which is
  * how `vocab_topk_approx` stays oracle-paired on the test corpus
  * while TopKSpec pins the genuinely-approximate small-capacity
  * regime.
  *
  * Merge of two summaries (the distributed step, after Cafaro et al.'s
  * parallel SpaceSaving): an item absent from a summary that is AT
  * capacity could have any true count in [0, that summary's floor], so
  * it contributes (floor, floor) to (count, err); absent from a
  * below-capacity summary it contributes exactly 0. The merged map is
  * re-trimmed to `capacity` by count.
  */
object TopK {

  /** item -> (estimated count, max overestimate). */
  type Buf = Map[String, (Long, Long)]

  class SpaceSaving(capacity: Int)
      extends Aggregator[String, Buf, Seq[(String, Long, Long)]] {
    require(capacity > 0)

    override def zero: Buf = Map.empty

    override def reduce(b: Buf, x: String): Buf = b.get(x) match {
      case Some((c, e)) => b.updated(x, (c + 1, e))
      case None if b.size < capacity => b.updated(x, (1L, 0L))
      case None =>
        // Evict the (count, item)-min entry; the newcomer inherits its
        // count as floor (+1) and as error bound. O(capacity) scan —
        // a production build keeps a heap; capacities here are <=10^4
        // so the scan is cache-resident.
        val (mi, (mc, _)) = b.minBy { case (k, (c, _)) => (c, k) }
        (b - mi).updated(x, (mc + 1, mc))
    }

    override def merge(a: Buf, b: Buf): Buf = {
      def floor(m: Buf): Long =
        if (m.size >= capacity) m.values.iterator.map(_._1).min else 0L
      val fa = floor(a)
      val fb = floor(b)
      val merged = (a.keySet ++ b.keySet).iterator.map { k =>
        val (ca, ea) = a.getOrElse(k, (fa, fa))
        val (cb, eb) = b.getOrElse(k, (fb, fb))
        k -> (ca + cb, ea + eb)
      }.toMap
      if (merged.size <= capacity) merged
      else merged.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }
        .take(capacity)
        .toMap
    }

    override def finish(r: Buf): Seq[(String, Long, Long)] =
      r.toSeq.map { case (k, (c, e)) => (k, c, e) }
        .sortBy { case (k, c, _) => (-c, k) }

    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
      ExpressionEncoder[Seq[(String, Long, Long)]]()
  }

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
}
