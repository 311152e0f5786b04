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

/** Exact per-group top-N rows with O(N) state — the scale-safe
  * alternative to `row_number().over(Window.partitionBy(g).orderBy(p
  * desc))` when N is small (domain caps, per-source exemplars).
  *
  * Why not the window? A per-group rank window SORTS every row of a
  * group inside one task — at 100 TB a popular domain is billions of
  * rows funneled through a single partition (the same skewed-key
  * full-sort pathology `sample_quality_buckets` documents for ntile).
  * This aggregate keeps a bounded N-entry heap per group instead:
  * partial aggregation combines map-side (each task's heap holds at
  * most N entries per group it saw), ONLY the heaps shuffle, and the
  * final merge is O(N log N) per group — no row set is ever sorted.
  * The answer is EXACT (unlike [[TopK]]'s SpaceSaving summary, which
  * trades exactness for a capacity bound on the number of DISTINCT
  * tracked items; here the bound N is the ANSWER's size, so nothing
  * is approximated).
  *
  * Total order: (priority DESC, id ASC) — ties at the cap admit the
  * smallest id, deterministically on any partitioning, which is what
  * lets a DuckDB `row_number` oracle replay the selection exactly.
  */
object GroupTopN {

  /** Bounded min-heap of (priority, id) pairs keyed by "worst kept":
    * the root is the entry that (priority DESC, id ASC) ranks LAST, so
    * a better newcomer replaces the root in O(log n). Parallel
    * primitive arrays, no per-entry allocation. */
  final class TopNBuffer(val n: Int) {
    require(n > 0, "group_top_n: n must be positive")
    val prio = new Array[Long](n)
    val id = new Array[Long](n)
    var size: Int = 0

    /** True iff (pa, ia) ranks WORSE than (pb, ib) under
      * (priority DESC, id ASC). */
    @inline private def worse(pa: Long, ia: Long, pb: Long,
        ib: Long): Boolean =
      pa < pb || (pa == pb && ia > ib)

    def add(p: Long, i: Long): Unit =
      if (size < n) {
        var c = size
        prio(c) = p; id(c) = i; size += 1
        // sift up: the heap keeps its WORST entry at the root (so an
        // incoming better entry can evict in O(log n)), i.e. parent
        // must be worse-or-equal than child — move the new entry up
        // only while IT is worse than its parent
        while (c > 0 && worse(p, i, prio((c - 1) / 2), id((c - 1) / 2))) {
          val par = (c - 1) / 2
          prio(c) = prio(par); id(c) = id(par)
          prio(par) = p; id(par) = i
          c = par
        }
      } else if (worse(prio(0), id(0), p, i)) {
        prio(0) = p; id(0) = i
        siftDown(0)
      }

    private def siftDown(start: Int): Unit = {
      var c = start
      var done = false
      while (!done) {
        val l = 2 * c + 1
        val r = l + 1
        // find the WORST of (c, l, r) — the heap property puts the
        // worst kept entry at the root
        var w = c
        if (l < size && worse(prio(l), id(l), prio(w), id(w))) w = l
        if (r < size && worse(prio(r), id(r), prio(w), id(w))) w = r
        if (w == c) done = true
        else {
          val tp = prio(c); val ti = id(c)
          prio(c) = prio(w); id(c) = id(w)
          prio(w) = tp; id(w) = ti
          c = w
        }
      }
    }

    def mergeIn(other: TopNBuffer): Unit = {
      var i = 0
      while (i < other.size) { add(other.prio(i), other.id(i)); i += 1 }
    }

    /** Entries in answer order: (priority DESC, id ASC) — via an
      * explicit comparator, NOT sortBy(-p, ...): negating
      * Long.MinValue is itself (overflow), which would rank a
      * MinValue priority FIRST instead of last (review-caught; the
      * SQL surface accepts any BIGINT priority). */
    def sorted: Array[(Long, Long)] = {
      val arr = Array.tabulate(size)(i => (prio(i), id(i)))
      arr.sortWith { case ((pa, ia), (pb, ib)) =>
        pa > pb || (pa == pb && ia < ib)
      }
    }
  }

  /** `group_top_n(priority, id, n)` ->
    * `array<struct<priority, id>>` in (priority DESC, id ASC) order,
    * at most `n` entries, exact. Null priority or id rows are skipped
    * (they cannot rank). */
  case class GroupTopNAgg(
      priority: Expression,
      idExpr: Expression,
      n: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[TopNBuffer]
      with BinaryLike[Expression] {
    require(n > 0, "group_top_n: n must be positive")

    override def left: Expression = priority
    override def right: Expression = idExpr

    override def checkInputDataTypes(): TypeCheckResult =
      if (priority.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"priority must be BIGINT, got ${priority.dataType.catalogString}")
      else if (idExpr.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"id must be BIGINT, got ${idExpr.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): TopNBuffer = new TopNBuffer(n)

    override def update(buf: TopNBuffer, input: InternalRow): TopNBuffer = {
      val p = priority.eval(input)
      if (p != null) {
        val i = idExpr.eval(input)
        if (i != null)
          buf.add(p.asInstanceOf[Long], i.asInstanceOf[Long])
      }
      buf
    }

    override def merge(buf: TopNBuffer, other: TopNBuffer): TopNBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: TopNBuffer): Any =
      new GenericArrayData(buf.sorted.map { case (p, i) =>
        InternalRow(p, i)
      })

    override def serialize(buf: TopNBuffer): Array[Byte] = {
      val bytes = new ByteArrayOutputStream(8 + 16 * buf.size)
      val out = new DataOutputStream(bytes)
      out.writeInt(buf.size)
      var i = 0
      while (i < buf.size) {
        out.writeLong(buf.prio(i)); out.writeLong(buf.id(i)); i += 1
      }
      out.flush()
      bytes.toByteArray
    }

    override def deserialize(storage: Array[Byte]): TopNBuffer = {
      val in = new DataInputStream(new ByteArrayInputStream(storage))
      val buf = new TopNBuffer(n)
      val sz = in.readInt()
      var i = 0
      while (i < sz) { buf.add(in.readLong(), in.readLong()); i += 1 }
      buf
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("priority", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
      containsNull = false)

    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): GroupTopNAgg =
      copy(mutableAggBufferOffset = newOffset)

    override def withNewInputAggBufferOffset(
        newOffset: Int): GroupTopNAgg =
      copy(inputAggBufferOffset = newOffset)

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): GroupTopNAgg =
      copy(priority = newLeft, idExpr = newRight)

    override def prettyName: String = "group_top_n"
  }

  /** The aggregate as a Column: `agg(priorityCol, idCol, n)`. */
  def agg(priorityCol: Column, idCol: Column, n: Int): Column =
    ColumnBridge.column(GroupTopNAgg(
      ColumnBridge.expression(priorityCol.cast("long")),
      ColumnBridge.expression(idCol.cast("long")),
      n).toAggregateExpression())

  /** At most `n` rows per group of `df`, the (priority DESC, id ASC)
    * best — exploded back to one row per kept entry with columns
    * (groupCols..., id, priority). One shuffle, heap-sized state. */
  def capPerGroup(df: DataFrame, groupCols: Seq[Column],
      priorityCol: Column, idCol: Column, n: Int): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(agg(priorityCol, idCol, n).as("__top"))
      .select(groupCols :+ explode(col("__top")).as("__e"): _*)
      .select(groupCols :+ col("__e.id").as("id") :+
        col("__e.priority").as("priority"): _*)

  /** Exact per-group top-k under (score DESC, id ASC) with a dense
    * 1..k rank column — the scale-safe replacement for
    * `row_number().over(Window.partitionBy(group).orderBy(score
    * DESC, id))` on per-query CANDIDATE frames, whose partitions grow
    * with the corpus (brute-force ANN ranks |corpus| candidates per
    * query; a common BM25 term's postings are corpus-proportional —
    * either way, one query's whole candidate set through ONE task).
    * Here only O(k) heap states shuffle and the ONLY window ranks the
    * <= k winners per group.
    *
    * `scoreCol` must already be rounded to at most `decimals`
    * decimals (every ranking score in this codebase is
    * `round(..., 4)`): the fixed-point mapping
    * `round(score * 10^decimals).cast(long)` is then injective and
    * order-preserving — heap selection under the long priority equals
    * the double ordering exactly — and `priority / 10^decimals`
    * reconstructs the IDENTICAL double (the long is exact below 2^53
    * and IEEE division is correctly rounded, agreeing with the
    * nearest-double result `round`'s BigDecimal path produced). The
    * outer `round` before the cast matters: the double nearest x.1234
    * times 10^4 can land a hair BELOW the integer, and a bare cast
    * truncates.
    *
    * RELAXED precondition for SHORTLIST selection (round-14 ADVICE):
    * the PQ/IVF-PQ ADC shortlists call this on UNROUNDED raw scores
    * at `decimals = 7`. There the fixed-point key is a quantization
    * of the score, not an exact image — two candidates within 5e-8
    * of each other can swap relative to the exact double ordering.
    * That is sound ONLY because those call sites feed an EXACT
    * rerank: a sub-1e-7 near-tie swap exchanges candidates the
    * downstream recall gate treats identically, and the final
    * published ordering comes from the rerank's own (properly
    * rounded) rankByScore call. A call site whose output ordering is
    * the PUBLISHED ordering must keep the strict
    * already-rounded-to-`decimals` contract. */
  def rankByScore(df: DataFrame, groupCols: Seq[Column],
      scoreCol: Column, idCol: Column, k: Int, decimals: Int = 4,
      scoreName: String = "score", idName: String = "id"): DataFrame = {
    val scale = math.pow(10.0, decimals)
    val winners = capPerGroup(df, groupCols,
      round(scoreCol * scale).cast("long"), idCol, k)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols: _*)
      .orderBy(col("priority").desc, col("id"))
    winners
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(groupCols :+ col("id").as(idName) :+
        (col("priority") / scale).as(scoreName) :+ col("rank"): _*)
  }
}
