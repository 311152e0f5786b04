package graft.ops

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Approximate heavy hitters (the ClickHouse `topK(k)(x)` analog) via
  * the SpaceSaving summary (Metwally, Agrawal, El Abbadi 2005 —
  * "Efficient Computation of Frequent and Top-k Elements in Data
  * Streams"), packaged as a native [[TypedImperativeAggregate]] so
  * Spark runs it as a partial+final object-hash aggregate: each task
  * folds its partition into a bounded `capacity`-entry summary and
  * ONLY those summaries shuffle.
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
  * Why a TypedImperativeAggregate and not a typed `Aggregator`? The
  * hot path is one map probe per input row. An Aggregator's immutable
  * `Map` buffer allocates a new map + boxed tuple per row, and its
  * ExpressionEncoder ser/des the whole buffer at every object-agg
  * fallback boundary; measured at sf0.1 that constant factor made this
  * the 2nd-most-expensive query in the bench. Here the buffer is a
  * plain mutable hash map of primitive-field entries, mutated in
  * place and serialized ONCE per partial (compact length-prefixed
  * binary, no row encoder), keeping per-row work at a single probe
  * with zero allocation for already-tracked items.
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

  /** One tracked item: estimated count (weight sum) and its max
    * overestimate. Mutable primitives so the per-row increment is a
    * field write, not a re-allocation. */
  final class Entry(var count: Long, var err: Long)

  /** Mutable SpaceSaving summary: item -> [[Entry]] plus the eviction
    * floor (the max estimate ever dropped at a trim — an upper bound
    * on any absent item's count). Eviction is LAZY-BATCHED: newcomers
    * enter at (floor + w, floor) and the map is trimmed back to
    * `capacity` only when it reaches 2x capacity — amortized
    * O(log capacity) per row, where the textbook evict-one-min is
    * O(capacity) per NEW item (measured 90+ s for one 600 k-row pass
    * at high eviction rates). Bounds are identical in form and tighter
    * in practice: the floor is the max DROPPED estimate, not the min
    * kept one. */
  final class SpaceSavingBuffer(val capacity: Int) {
    require(capacity > 0)
    val entries = new java.util.HashMap[UTF8String, Entry](capacity * 4)
    var floor: Long = 0L

    /** Add one occurrence of `item` with weight `w`. `item` may point
      * into a reused row buffer: the probe needs no copy, and only a
      * first-seen key is cloned for retention — the common case
      * (already-tracked item) is a single probe + field increment with
      * zero allocation. */
    def add(item: UTF8String, w: Long): Unit = {
      // SpaceSaving's floor/err_max soundness assumes monotone counts;
      // a negative weight would silently invalidate every bound the
      // scaladoc promises, so refuse it (the SQL surface exposes add
      // to arbitrary callers — documentation alone is not a guard)
      require(w >= 0,
        s"space_saving_topk: negative weight $w would invalidate the " +
          "SpaceSaving floor/error bounds")
      val e = entries.get(item)
      if (e != null) e.count += w
      else {
        entries.put(item.clone(), new Entry(floor + w, floor))
        if (entries.size > 2 * capacity) trimTo(capacity)
      }
    }

    /** Keep the `cap` highest-estimate entries; fold every dropped
      * estimate into the floor. Dropped ests <= kept ests, so the new
      * floor stays a sound upper bound for ALL absent items. */
    def trimTo(cap: Int): Unit = {
      if (entries.size > cap) {
        val arr = new Array[(UTF8String, Entry)](entries.size)
        val it = entries.entrySet.iterator
        var i = 0
        while (it.hasNext) {
          val kv = it.next(); arr(i) = (kv.getKey, kv.getValue); i += 1
        }
        java.util.Arrays.sort(arr, EntryOrder)
        floor = math.max(floor, arr(cap)._2.count)
        entries.clear()
        i = 0
        while (i < cap) { entries.put(arr(i)._1, arr(i)._2); i += 1 }
      }
    }

    /** Fold `other` into this summary in place (see scaladoc above for
      * the absent-key floor accounting). */
    def mergeIn(other: SpaceSavingBuffer): Unit = {
      val fb = other.floor
      if (fb > 0) {
        val it = entries.entrySet.iterator
        while (it.hasNext) {
          val kv = it.next()
          if (!other.entries.containsKey(kv.getKey)) {
            kv.getValue.count += fb; kv.getValue.err += fb
          }
        }
      }
      val fa = floor
      val ot = other.entries.entrySet.iterator
      while (ot.hasNext) {
        val kv = ot.next()
        val mine = entries.get(kv.getKey)
        if (mine != null) {
          mine.count += kv.getValue.count; mine.err += kv.getValue.err
        } else {
          entries.put(kv.getKey,
            new Entry(fa + kv.getValue.count, fa + kv.getValue.err))
        }
      }
      floor = fa + fb
      trimTo(capacity)
    }
  }

  /** Sort by (-count, item): highest estimates first, binary-collation
    * item order breaking ties (same collation Spark's own string sort
    * uses, so summary trims and final ORDER BY agree). */
  private object EntryOrder
      extends java.util.Comparator[(UTF8String, Entry)] {
    override def compare(a: (UTF8String, Entry),
        b: (UTF8String, Entry)): Int = {
      val c = java.lang.Long.compare(b._2.count, a._2.count)
      if (c != 0) c else a._1.compareTo(b._1)
    }
  }

  /** The SpaceSaving aggregate function: `spacesaving_topk(item, w)`
    * -> `array<struct<term, cnt_est, err_max>>` sorted by estimate
    * descending. Weighted (ClickHouse topKWeighted) when `weight` is a
    * real column; plain topK is the `lit(1L)` special case. Weights
    * must be non-negative. */
  case class SpaceSavingTopK(
      child: Expression,
      weight: Expression,
      capacity: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[SpaceSavingBuffer]
      with BinaryLike[Expression] {
    require(capacity > 0, "SpaceSaving capacity must be positive")

    override def left: Expression = child
    override def right: Expression = weight

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != StringType)
        TypeCheckResult.TypeCheckFailure(
          s"item must be STRING, got ${child.dataType.catalogString}")
      else if (weight.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"weight must be BIGINT, got ${weight.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): SpaceSavingBuffer =
      new SpaceSavingBuffer(capacity)

    override def update(buf: SpaceSavingBuffer,
        input: InternalRow): SpaceSavingBuffer = {
      val item = child.eval(input)
      if (item != null) {
        val w = weight.eval(input)
        if (w != null) buf.add(item.asInstanceOf[UTF8String],
          w.asInstanceOf[Long])
      }
      buf
    }

    override def merge(buf: SpaceSavingBuffer,
        other: SpaceSavingBuffer): SpaceSavingBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: SpaceSavingBuffer): Any = {
      val arr = new Array[(UTF8String, Entry)](buf.entries.size)
      val it = buf.entries.entrySet.iterator
      var i = 0
      while (it.hasNext) {
        val kv = it.next(); arr(i) = (kv.getKey, kv.getValue); i += 1
      }
      java.util.Arrays.sort(arr, EntryOrder)
      new GenericArrayData(arr.map { case (k, e) =>
        InternalRow(k, e.count, e.err)
      })
    }

    /** One compact binary write per partial (see [[TopK.toBytes]]). */
    override def serialize(buf: SpaceSavingBuffer): Array[Byte] =
      toBytes(buf)

    override def deserialize(storage: Array[Byte]): SpaceSavingBuffer =
      fromBytes(storage, capacity)

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt_est", LongType, nullable = false),
      StructField("err_max", LongType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): SpaceSavingTopK =
      copy(mutableAggBufferOffset = newOffset)

    override def withNewInputAggBufferOffset(
        newOffset: Int): SpaceSavingTopK =
      copy(inputAggBufferOffset = newOffset)

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): SpaceSavingTopK =
      copy(child = newLeft, weight = newRight)

    override def prettyName: String = "spacesaving_topk"
  }

  private def summarize(items: DataFrame, itemCol: Column,
      weightCol: Column, k: Int, capacity: Int): DataFrame = {
    val prepared = items
      .select(itemCol.cast("string").as("item"),
        weightCol.cast("long").as("w"))
      .filter(col("item").isNotNull && col("w").isNotNull)
    val agg = ColumnBridge.column(SpaceSavingTopK(
      ColumnBridge.expression(col("item")),
      ColumnBridge.expression(col("w")),
      capacity).toAggregateExpression())
    prepared
      .select(agg.as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.term").as("term"),
        col("e.cnt_est").as("cnt_est"),
        col("e.err_max").as("err_max"))
      .orderBy(col("cnt_est").desc, col("term"))
      .limit(k)
  }

  /** Top-`k` most frequent values of `itemCol` with bounded state:
    * columns (term, cnt_est, err_max), counts exact iff no eviction
    * occurred (err_max = 0 certifies a row's count is exact).
    */
  def topK(items: DataFrame, itemCol: Column, k: Int,
      capacity: Int = 4096): DataFrame =
    summarize(items, itemCol, lit(1L), k, capacity)

  /** Weighted top-`k` (ClickHouse topKWeighted analog): same bounded
    * state and output shape as [[topK]], with `cnt_est` the estimated
    * WEIGHT SUM per item — e.g. revenue heavy hitters instead of
    * frequency heavy hitters. Exact iff no eviction occurred. */
  def topKWeighted(items: DataFrame, itemCol: Column, weightCol: Column,
      k: Int, capacity: Int = 4096): DataFrame =
    summarize(items, itemCol, weightCol, k, capacity)

  /** Compact binary form of a summary: floor, n, then length-prefixed
    * UTF-8 key bytes + two longs per entry. Shared by the aggregate's
    * partial serializer and the streaming pipeline's keyed state /
    * summary store ([[graft.pipeline.TopKPipeline]]). */
  def toBytes(buf: SpaceSavingBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeLong(buf.floor)
    out.writeInt(buf.entries.size)
    val it = buf.entries.entrySet.iterator
    while (it.hasNext) {
      val kv = it.next()
      val kb = kv.getKey.getBytes
      out.writeInt(kb.length)
      out.write(kb)
      out.writeLong(kv.getValue.count)
      out.writeLong(kv.getValue.err)
    }
    out.flush()
    bytes.toByteArray
  }

  def fromBytes(storage: Array[Byte], capacity: Int): SpaceSavingBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val buf = new SpaceSavingBuffer(capacity)
    buf.floor = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt())
      in.readFully(kb)
      buf.entries.put(UTF8String.fromBytes(kb),
        new Entry(in.readLong(), in.readLong()))
      i += 1
    }
    buf
  }
}
