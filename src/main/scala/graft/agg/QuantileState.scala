package graft.agg

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.QuantileSummaries
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Mergeable QUANTILE states — the `quantileState` /
  * AggregatingMergeTree family member for order statistics
  * (kafka+clickhouse.md:205-211, 396-401 pattern, applied to
  * quantiles instead of counts): a Greenwald-Khanna summary per
  * (key, batch) serialized as an opaque binary state, unioned under
  * the sketch's own merge, finalized to quantile values at read time.
  *
  * Quantiles are the canonical NON-additive, NON-distributive
  * aggregate: per-batch medians cannot be combined at all, but their
  * GK summaries merge with the rank-error guarantee intact
  * (eps_merged <= eps, both summaries' counts weighted) — so a store
  * of states supports re-aggregation to ANY coarser grouping from
  * O(1/eps) state per key, never rescanning raw data.
  *
  * The sketch is Catalyst's own
  * [[org.apache.spark.sql.catalyst.util.QuantileSummaries]] (the GK
  * variant behind `percentile_approx`) — reused rather than
  * reimplemented so the accuracy/compression behavior matches the
  * engine's built-in approx quantiles; only the state surface
  * (serialize / merge-of-states / finalize-from-state) is new, which
  * is exactly what `percentile_approx` does not expose.
  */
object QuantileState {

  /** Compact codec for a compressed summary:
    * [compressThreshold, relativeError, count, n, n x (value,g,delta)].
    */
  private[agg] def encode(qs0: QuantileSummaries): Array[Byte] = {
    val qs = qs0.compress()
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(qs.compressThreshold)
    out.writeDouble(qs.relativeError)
    out.writeLong(qs.count)
    out.writeInt(qs.sampled.length)
    qs.sampled.foreach { s =>
      out.writeDouble(s.value); out.writeLong(s.g); out.writeLong(s.delta)
    }
    out.flush()
    bytes.toByteArray
  }

  private[agg] def decode(storage: Array[Byte]): QuantileSummaries = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val ct = in.readInt()
    val eps = in.readDouble()
    val count = in.readLong()
    val n = in.readInt()
    val stats = new Array[QuantileSummaries.Stats](n)
    var i = 0
    while (i < n) {
      stats(i) = QuantileSummaries.Stats(
        in.readDouble(), in.readLong(), in.readLong())
      i += 1
    }
    new QuantileSummaries(ct, eps, stats, count, true)
  }

  /** Merge respecting empties (QuantileSummaries.merge requires both
    * sides compressed and non-degenerate). */
  private[agg] def mergeSummaries(a: QuantileSummaries,
      b: QuantileSummaries): QuantileSummaries =
    if (b.count == 0) a
    else if (a.count == 0) b
    else a.compress().merge(b.compress())

  /** Codegen/eval helper: quantile `p` of an encoded state, null for
    * the empty state. */
  def queryBytes(storage: Array[Byte], p: Double): java.lang.Double = {
    val qs = decode(storage)
    if (qs.count == 0) null
    else qs.query(p).map(java.lang.Double.valueOf).orNull
  }

  /** `quantile_state(x, eps)` -> BINARY: build one mergeable GK state
    * per group. Input must be DOUBLE (Column helper casts). */
  case class QuantileStateAgg(
      child: Expression,
      relativeError: Double,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries]
      with UnaryLike[Expression] {
    require(relativeError > 0 && relativeError < 1,
      "quantile_state relative error must be in (0, 1)")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"quantile_state value must be DOUBLE, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): QuantileSummaries =
      new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold, relativeError)

    override def update(buf: QuantileSummaries,
        input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buf else buf.insert(v.asInstanceOf[Double])
    }

    override def merge(buf: QuantileSummaries,
        other: QuantileSummaries): QuantileSummaries =
      mergeSummaries(buf, other)

    override def eval(buf: QuantileSummaries): Any = encode(buf)
    override def serialize(buf: QuantileSummaries): Array[Byte] =
      encode(buf)
    override def deserialize(storage: Array[Byte]): QuantileSummaries =
      decode(storage)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): QuantileStateAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): QuantileStateAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): QuantileStateAgg = copy(child = newChild)

    override def prettyName: String = "quantile_state"
  }

  /** `quantile_state_merge(state)` -> BINARY: union already-built
    * states (the read-side / compaction merge of the Aggregating
    * contract — rollups to coarser keys happen here). */
  case class QuantileStateMergeAgg(
      child: Expression,
      override val mutableAggBufferOffset: Int = 0,
      override val inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[QuantileSummaries]
      with UnaryLike[Expression] {

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"quantile_state_merge expects a BINARY state, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def createAggregationBuffer(): QuantileSummaries =
      new QuantileSummaries(
        QuantileSummaries.defaultCompressThreshold,
        QuantileSummaries.defaultRelativeError)

    override def update(buf: QuantileSummaries,
        input: InternalRow): QuantileSummaries = {
      val v = child.eval(input)
      if (v == null) buf
      else mergeSummaries(buf, decode(v.asInstanceOf[Array[Byte]]))
    }

    override def merge(buf: QuantileSummaries,
        other: QuantileSummaries): QuantileSummaries =
      mergeSummaries(buf, other)

    override def eval(buf: QuantileSummaries): Any = encode(buf)
    override def serialize(buf: QuantileSummaries): Array[Byte] =
      encode(buf)
    override def deserialize(storage: Array[Byte]): QuantileSummaries =
      decode(storage)

    override def dataType: DataType = BinaryType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(
        newOffset: Int): QuantileStateMergeAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(
        newOffset: Int): QuantileStateMergeAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(
        newChild: Expression): QuantileStateMergeAgg =
      copy(child = newChild)

    override def prettyName: String = "quantile_state_merge"
  }

  /** `quantile_state_value(state, p)` -> DOUBLE: finalize one
    * quantile from an encoded state; null for the empty state. Runs
    * on finalize rows only (one per output group), so the
    * decode-per-call cost never touches the scan path. */
  case class QuantileStateValue(child: Expression, prob: Double)
      extends UnaryExpression {
    require(prob >= 0 && prob <= 1,
      "quantile probability must be in [0, 1]")

    override def checkInputDataTypes(): TypeCheckResult =
      if (child.dataType != BinaryType)
        TypeCheckResult.TypeCheckFailure(
          s"quantile_state_value expects a BINARY state, got " +
            child.dataType.catalogString)
      else TypeCheckResult.TypeCheckSuccess

    override def nullSafeEval(bytes: Any): Any =
      queryBytes(bytes.asInstanceOf[Array[Byte]], prob)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val r = ctx.freshName("q")
        s"""java.lang.Double $r =
           |  graft.agg.QuantileState$$.MODULE$$.queryBytes($c, ${prob}D);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
      })

    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    override protected def withNewChildInternal(
        newChild: Expression): QuantileStateValue = copy(child = newChild)

    override def prettyName: String = "quantile_state_value"
  }

  /** Aggregate column: mergeable quantile state of `value`. */
  def stateAgg(value: Column, relativeError: Double = 0.001): Column =
    ColumnBridge.column(QuantileStateAgg(
      ColumnBridge.expression(value.cast("double")), relativeError)
      .toAggregateExpression())

  /** Aggregate column: union of encoded states. */
  def mergeAgg(state: Column): Column =
    ColumnBridge.column(QuantileStateMergeAgg(
      ColumnBridge.expression(state)).toAggregateExpression())

  /** Scalar column: quantile `p` finalized from an encoded state. */
  def value(state: Column, p: Double): Column =
    ColumnBridge.column(QuantileStateValue(
      ColumnBridge.expression(state), p))
}
