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

/** Deterministic bounded-state uniform sampling — the ClickHouse
  * `quantileDeterministic(x, determinator)` idea as a first-class
  * mergeable aggregate: per group, keep the `k` rows whose
  * DETERMINATOR HASH is smallest ("bottom-k by hash"). A hash of a
  * stable row identity is uniform, so the kept set is a uniform random
  * sample — but with NO RNG anywhere, the same input multiset yields
  * the same sample under every partitioning, merge order, retry, or
  * engine (the same no-`rand()` discipline as [[Sampling]]).
  *
  * Why this shape at 100 TB: per-task state is capped at `k` pairs and
  * only those summaries shuffle (the identical summary-not-data trade
  * as [[TopK]]); the merge is union-then-retrim, so partial samples
  * from a million tasks fold associatively. When `k >= |group|` the
  * "sample" is the complete multiset and everything derived from it is
  * EXACT — which is how the registered query stays oracle-paired at
  * verify scale while the bounded-state approximation engages at
  * bench scale and beyond.
  *
  * Derived quantiles ([[approxQuantiles]]) use nearest-rank over the
  * value-sorted sample — actual data values, one IEEE multiply for the
  * rank, no interpolation seam (see agg_quantiles_multi's rationale).
  */
object DetSample {

  /** Bounded buffer: the k pairs with smallest (hash, value), kept in
    * a BINARY MAX-HEAP keyed lexicographically by (hash, value) — the
    * root is the largest kept pair, so an arriving pair either beats
    * the root (replace + sift) or is discarded in one comparison. The
    * (hash, value) tie-break makes eviction deterministic even for
    * colliding hashes. */
  final class Buf(val k: Int) {
    require(k > 0)
    val hs = new Array[Long](k)
    val vs = new Array[Double](k)
    var size = 0

    private def greater(h1: Long, v1: Double, h2: Long, v2: Double) =
      h1 > h2 || (h1 == h2 && v1 > v2)

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val p = (i - 1) / 2
        if (greater(hs(i), vs(i), hs(p), vs(p))) {
          val th = hs(i); val tv = vs(i)
          hs(i) = hs(p); vs(i) = vs(p); hs(p) = th; vs(p) = tv
          i = p
        } else return
      }
    }

    private def siftDown(): Unit = {
      var i = 0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && greater(hs(l), vs(l), hs(m), vs(m))) m = l
        if (r < size && greater(hs(r), vs(r), hs(m), vs(m))) m = r
        if (m == i) return
        val th = hs(i); val tv = vs(i)
        hs(i) = hs(m); vs(i) = vs(m); hs(m) = th; vs(m) = tv
        i = m
      }
    }

    def add(h: Long, v: Double): Unit =
      if (size < k) {
        hs(size) = h; vs(size) = v; size += 1; siftUp(size - 1)
      } else if (greater(hs(0), vs(0), h, v)) {
        hs(0) = h; vs(0) = v; siftDown()
      }
  }

  /** `deterministic_sample(value, determinator)` -> array<double> of
    * the kept values, ordered by (hash, value). Value must be DOUBLE,
    * determinator BIGINT (callers hash with xxhash64). */
  case class DeterministicSample(
      child: Expression,
      det: Expression,
      k: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buf] with BinaryLike[Expression] {
    require(k > 0, "sample size must be positive")

    override def left: Expression = child
    override def right: Expression = det

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"value must be DOUBLE, got ${child.dataType.catalogString}")
      else if (det.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"determinator must be BIGINT, got ${det.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): Buf = new Buf(k)

    override def update(buf: Buf, input: InternalRow): Buf = {
      val v = child.eval(input)
      if (v != null) {
        val h = det.eval(input)
        if (h != null)
          buf.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
      }
      buf
    }

    override def merge(buf: Buf, other: Buf): Buf = {
      var i = 0
      while (i < other.size) { buf.add(other.hs(i), other.vs(i)); i += 1 }
      buf
    }

    override def eval(buf: Buf): Any = {
      val idx = Array.range(0, buf.size)
      val sorted = idx.sortWith { (a, b) =>
        buf.hs(a) < buf.hs(b) ||
          (buf.hs(a) == buf.hs(b) && buf.vs(a) < buf.vs(b))
      }
      new GenericArrayData(sorted.map(buf.vs))
    }

    override def serialize(buf: Buf): Array[Byte] = {
      val bytes = new ByteArrayOutputStream()
      val out = new DataOutputStream(bytes)
      out.writeInt(buf.size)
      var i = 0
      while (i < buf.size) {
        out.writeLong(buf.hs(i)); out.writeDouble(buf.vs(i)); i += 1
      }
      out.flush()
      bytes.toByteArray
    }

    override def deserialize(storage: Array[Byte]): Buf = {
      val in = new DataInputStream(new ByteArrayInputStream(storage))
      val buf = new Buf(k)
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.add(in.readLong(), in.readDouble()); i += 1 }
      buf
    }

    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): DeterministicSample =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): DeterministicSample =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): DeterministicSample =
      copy(child = newLeft, det = newRight)

    override def prettyName: String = "deterministic_sample"
  }

  /** Aggregate column: bottom-`k`-by-hash sample of `value`, with
    * `determinator` any stable row-identity column set (hashed with
    * xxhash64 — per [[graft.query]] convention that hash is Spark-side
    * only, so queries built on it are rows-only unless k covers the
    * group). */
  def sampleAgg(value: Column, k: Int, determinator: Column*): Column =
    ColumnBridge.column(DeterministicSample(
      ColumnBridge.expression(value.cast("double")),
      ColumnBridge.expression(xxhash64(determinator: _*)),
      k).toAggregateExpression())

  /** Nearest-rank quantiles from a sample column produced by
    * [[sampleAgg]]: value at rank `ceil(p * n)` of the value-sorted
    * sample. Exact (and engine-portable) whenever the sample is the
    * whole group. An EMPTY sample (a group whose values were all
    * null) yields a null quantile — guarded explicitly so ANSI mode
    * doesn't throw on the out-of-range element_at. */
  def quantileOf(sample: Column, p: Double): Column = {
    val sorted = array_sort(sample)
    when(size(sample) > 0, element_at(sorted,
      greatest(lit(1), ceil(size(sample) * p)).cast("int")))
  }

  /** Per-group deterministic-sample quantiles in one bounded-state
    * pass: groupBy(keys) -> one sample aggregate -> nearest-rank
    * projections. */
  def approxQuantiles(df: DataFrame, keys: Seq[String], value: Column,
      determinator: Seq[Column], probs: Seq[Double], k: Int): DataFrame = {
    val sampled = df.groupBy(keys.map(col): _*)
      .agg(sampleAgg(value, k, determinator: _*).as("__sample"))
    val qs = probs.map(p =>
      quantileOf(col("__sample"), p).as(s"p${(p * 100).round}"))
    sampled.select(keys.map(col) ++
      (size(col("__sample")).cast("long").as("n_sampled") +: qs): _*)
  }
}
