package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable COUNT-MIN states — the point-FREQUENCY member of the
  * AggregatingMergeTree state family (kafka+clickhouse.md:205-211,
  * 396-401 pattern), completing the sketch quartet: HLL = distinct
  * ([[SketchStore]]), GK = quantiles ([[QuantileState]]), SpaceSaving
  * = top-k ([[graft.ops.TopK]]), Count-Min = per-key frequency
  * (Cormode & Muthukrishnan 2005).
  *
  * A CMS is a LINEAR sketch — depth x width counters that add
  * elementwise — so unlike the trimmed SpaceSaving summaries (whose
  * merge loosens bounds), merging CMS states is EXACT: the merged
  * sketch is bit-identical to one built over the concatenated stream.
  * That makes it the right store-resident frequency state: per-batch
  * states roll up to any coarser grouping with the one-sided guarantee
  * intact (estimate >= true count, overshoot <= (e/width) * total
  * with probability 1 - e^-depth).
  *
  * Keys are pre-hashed to a long with the engine's own xxhash64
  * (seed 42) — the Column/SQL surfaces wrap the input themselves, so
  * any input type works and build/probe agree by construction. Row i
  * then derives its counter index by remixing (keyHash, i) through a
  * splitmix64 finalizer — d pairwise-independent-enough hashes from
  * one base hash, the same single-base-hash trick the MinHash
  * signatures use (ops/Dedup.scala).
  */
object CountMinState {

  /** depth x width counters + total count. counters(i*width + j). */
  final class CmsBuffer(val depth: Int, val width: Int,
      var n: Long, val counters: Array[Long]) {

    def add(keyHash: Long): Unit = {
      var i = 0
      while (i < depth) {
        counters(i * width + slot(keyHash, i)) += 1L
        i += 1
      }
      n += 1L
    }

    def mergeIn(other: CmsBuffer): Unit = {
      require(other.depth == depth && other.width == width,
        s"cms_state_merge: shape mismatch ($depth x $width vs " +
          s"${other.depth} x ${other.width}) — states only merge " +
          "across identical sketch parameters")
      var i = 0
      while (i < counters.length) {
        counters(i) += other.counters(i)
        i += 1
      }
      n += other.n
    }

    def query(keyHash: Long): Long = {
      // depth-0 = the never-updated merge sentinel (cms_state_merge
      // over an all-NULL or empty state group); an empty sketch has
      // seen nothing, so every frequency bound is 0 — without the
      // guard the min-loop never runs and the Long.MaxValue seed
      // leaks out as the answer
      if (depth == 0) return 0L
      var est = Long.MaxValue
      var i = 0
      while (i < depth) {
        val c = counters(i * width + slot(keyHash, i))
        if (c < est) est = c
        i += 1
      }
      est
    }

    private def slot(keyHash: Long, row: Int): Int =
      java.lang.Math.floorMod(mix(keyHash + row * GoldenGamma), width)
  }

  private val GoldenGamma = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer: full-avalanche remix of the base hash. */
  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private[agg] def empty(depth: Int, width: Int): CmsBuffer =
    new CmsBuffer(depth, width, 0L, new Array[Long](depth * width))

  /** Codec: [depth, width, n, depth*width counters]. */
  private[agg] def encode(b: CmsBuffer): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(b.depth)
    out.writeInt(b.width)
    out.writeLong(b.n)
    var i = 0
    while (i < b.counters.length) { out.writeLong(b.counters(i)); i += 1 }
    out.flush()
    bytes.toByteArray
  }

  private[agg] def decode(storage: Array[Byte]): CmsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val d = in.readInt()
    val w = in.readInt()
    val n = in.readLong()
    val counters = new Array[Long](d * w)
    var i = 0
    while (i < counters.length) { counters(i) = in.readLong(); i += 1 }
    new CmsBuffer(d, w, n, counters)
  }

  /** Codegen/eval helper: point-frequency upper bound of a pre-hashed
    * key against an encoded state. */
  def queryBytes(storage: Array[Byte], keyHash: Long): Long =
    decode(storage).query(keyHash)

  /** `cms_state(x, depth, width)` -> BINARY (x pre-hashed to LONG by
    * the surface wrappers). */
  case class CmsStateAgg(
      child: Expression,
      depth: Int,
      width: Int,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CmsBuffer]
      with UnaryLike[Expression] {
    require(depth >= 1 && depth <= 16,
      "cms_state depth must be in [1, 16]")
    require(width >= 16, "cms_state width must be >= 16")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"cms_state key must be LONG (pre-hashed), got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): CmsBuffer = empty(depth, width)

    override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
      val v = child.eval(input)
      if (v != null) buf.add(v.asInstanceOf[Long])
      buf
    }

    override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer = {
      buf.mergeIn(other); buf
    }

    override def eval(buf: CmsBuffer): Any = encode(buf)
    override def serialize(buf: CmsBuffer): Array[Byte] = encode(buf)
    override def deserialize(storage: Array[Byte]): CmsBuffer =
      decode(storage)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): CmsStateAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): CmsStateAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): CmsStateAgg = copy(child = newChild)

    override def prettyName: String = "cms_state"
  }

  /** `cms_state_merge(state)` -> BINARY: elementwise-exact union of
    * encoded states (the read-side / compaction / rollup merge). The
    * buffer adopts the first state's shape; mismatched shapes fail
    * loudly rather than merging nonsense. */
  case class CmsStateMergeAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[CmsBuffer]
      with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"cms_state_merge expects a BINARY state, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    // empty sentinel (depth 0 impossible via the agg): replaced by the
    // first real state's shape on update/merge
    override def createAggregationBuffer(): CmsBuffer =
      new CmsBuffer(0, 0, 0L, Array.emptyLongArray)

    private def mergeBuffers(a: CmsBuffer, b: CmsBuffer): CmsBuffer =
      if (b.depth == 0) a
      else if (a.depth == 0) b
      else { a.mergeIn(b); a }

    override def update(buf: CmsBuffer, input: InternalRow): CmsBuffer = {
      val v = child.eval(input)
      if (v == null) buf
      else mergeBuffers(buf, decode(v.asInstanceOf[Array[Byte]]))
    }

    override def merge(buf: CmsBuffer, other: CmsBuffer): CmsBuffer =
      mergeBuffers(buf, other)

    override def eval(buf: CmsBuffer): Any = encode(buf)
    override def serialize(buf: CmsBuffer): Array[Byte] = encode(buf)
    override def deserialize(storage: Array[Byte]): CmsBuffer =
      decode(storage)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): CmsStateMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): CmsStateMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): CmsStateMergeAgg = copy(child = newChild)

    override def prettyName: String = "cms_state_merge"
  }

  /** `cms_state_query(state, key)` -> LONG: point-frequency upper
    * bound from an encoded state (key pre-hashed by the surface
    * wrappers). Runs per output row, never on the scan path. */
  case class CmsStateQuery(left: Expression, right: Expression)
      extends BinaryExpression {

    override def checkInputDataTypes(): TypeCheckResult =
      if (left.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"cms_state_query expects a BINARY state, got " +
            left.dataType.catalogString)
      else if (right.dataType != LongType)
        TypeCheckResult.TypeCheckFailure(
          s"cms_state_query key must be LONG (pre-hashed), got " +
            right.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def nullSafeEval(state: Any, key: Any): Any =
      queryBytes(state.asInstanceOf[Array[Byte]],
        key.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (s, k) =>
        s"${ev.value} = " +
          s"graft.agg.CountMinState$$.MODULE$$.queryBytes($s, $k);")

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): CmsStateQuery =
      copy(left = newLeft, right = newRight)

    override def prettyName: String = "cms_state_query"
  }

  /** Widens integral keys to LONG after resolution (the type is not
    * known at construction — `col("x")` arrives unresolved), so the
    * engine-wide key hash sees ONE canonical type per numeric value:
    * XxHash64 hashes INT and LONG inputs differently, and without the
    * widening a sketch built over an INT column probed with a LONG
    * literal (the natural `lit(7L)`) silently returned near-zero
    * garbage frequencies. Non-integral types pass through untouched.
    */
  private[agg] case class IntegralToLong(child: Expression)
      extends UnaryExpression {

    private def widens: Boolean = child.dataType match {
      case ByteType | ShortType | IntegerType => true
      case _ => false
    }

    override def dataType: DataType =
      if (widens) LongType else child.dataType

    override def nullSafeEval(v: Any): Any =
      if (!widens) v
      else v match {
        case b: java.lang.Byte => b.longValue()
        case s: java.lang.Short => s.longValue()
        case i: java.lang.Integer => i.longValue()
      }

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      if (widens) defineCodeGen(ctx, ev, c => s"(long) $c")
      else defineCodeGen(ctx, ev, c => c)

    override protected def withNewChildInternal(
        newChild: Expression): IntegralToLong = copy(child = newChild)

    override def prettyName: String = "integral_to_long"
  }

  /** The engine-wide key hash (xxhash64, seed 42 — identical to
    * `functions.xxhash64` over a LONG-canonicalized key): applied to
    * BOTH build and probe keys by every surface, so callers never hash
    * by hand and build/probe agree regardless of declared integer
    * width. */
  private def hashed(key: Expression): Expression =
    XxHash64(Seq(IntegralToLong(key)), 42L)

  private[graft] def hashedExpr(key: Expression): Expression = hashed(key)

  /** Aggregate column: mergeable frequency state of `key`. */
  def stateAgg(key: Column, depth: Int = 4, width: Int = 1024): Column =
    ColumnBridge.column(CmsStateAgg(
      hashed(ColumnBridge.expression(key)), depth, width)
      .toAggregateExpression())

  /** Aggregate column: elementwise union of encoded states. */
  def mergeAgg(state: Column): Column =
    ColumnBridge.column(CmsStateMergeAgg(
      ColumnBridge.expression(state)).toAggregateExpression())

  /** Scalar column: point-frequency upper bound of `key`. */
  def value(state: Column, key: Column): Column =
    ColumnBridge.column(CmsStateQuery(
      ColumnBridge.expression(state),
      hashed(ColumnBridge.expression(key))))
}
