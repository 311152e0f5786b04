package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization codebooks (Jégou et al. 2011, "Product
  * Quantization for Nearest Neighbor Search"): the embedding space is
  * split into `m` contiguous sub-spaces of `subDim` dims; each
  * sub-space carries its own `k`-centroid codebook. A vector encodes
  * as m small codes (log2(k) bits each) — at m=8/k=32 that is 5 bytes
  * of index per 256-byte float vector. `centNormSq(s)(j)` caches
  * |c_sj|² so reconstructed norms are m lookups (sub-spaces occupy
  * disjoint coordinates, so |x̂|² = Σ_s |c_s,code_s|² exactly).
  */
case class PqCodebooks(m: Int, k: Int, subDim: Int,
    cents: Array[Array[Array[Double]]],
    centNormSq: Array[Array[Double]]) extends Serializable

/** Per-query-set ADC lookup tables: `lut(q)(s)(j)` = dot(query_q's
  * sub-vector s, centroid j of sub-space s), plus each query's full
  * norm and id. Built once per query SET on the driver (bounded — the
  * query side is the broadcast-small side by the same contract as
  * every other topK in this engine) and broadcast.
  */
case class PqAdcLut(qids: Array[Long], qnorms: Array[Double],
    lut: Array[Array[Array[Double]]],
    centNormSq: Array[Array[Double]]) extends Serializable

private[functions] object PqExpressions {
  def requireFloatArray(name: String, t: DataType): TypeCheckResult =
    t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<float|double>, got ${other.catalogString}")
    }
}

/** `pq_encode(emb)`: the m sub-space codes of one embedding as
  * array<int> — per sub-space, argmin_j |v_s - c_sj|², computed as
  * argmin of (|c_sj|² - 2 v_s·c_sj) so the vector's own norm never
  * enters; ties break to the lowest index (deterministic). Codebooks
  * ride ONE broadcast probed per row — same broadcast-not-literals
  * discipline as [[CentroidTopCells]] / [[LshSignatures]].
  *
  * Non-nullable with a defined NULL-input identity (all-zero codes):
  * a nullable code column in a join key invites the
  * inferred-isnotnull re-inlining pushdown documented on
  * [[SimHash64.nullable]].
  */
case class PqEncode(child: Expression, books: Broadcast[PqCodebooks])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    PqExpressions.requireFloatArray(prettyName, child.dataType)

  @transient private lazy val cb: PqCodebooks = books.value
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for the generated-code call-through (see
    * [[SimHash64.simhash]]). */
  def encode(v: ArrayData): ArrayData = {
    val codes = new Array[Int](cb.m)
    val n = v.numElements()
    var s = 0
    while (s < cb.m) {
      val base = s * cb.subDim
      var best = 0
      var bestScore = Double.MaxValue
      var j = 0
      while (j < cb.k) {
        val c = cb.cents(s)(j)
        var dot = 0.0
        var d = 0
        val lim = math.min(cb.subDim, math.max(0, n - base))
        if (elemIsFloat) {
          while (d < lim) { dot += v.getFloat(base + d).toDouble * c(d); d += 1 }
        } else {
          while (d < lim) { dot += v.getDouble(base + d) * c(d); d += 1 }
        }
        val score = cb.centNormSq(s)(j) - 2.0 * dot
        if (score < bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(s) = best
      s += 1
    }
    new GenericArrayData(codes)
  }

  def emptyCodes(): ArrayData = new GenericArrayData(new Array[Int](cb.m))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyCodes() else encode(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    val ad = classOf[ArrayData].getName
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      $ad ${ev.value} = ${childGen.isNull}
        ? $ref.emptyCodes()
        : ($ad) $ref.encode(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

/** `pq_adc_cosine(codes)`: the asymmetric-distance (ADC) cosine of the
  * ENCODED corpus vector against every query in the broadcast LUT, as
  * array<double> indexed by query position. Per query: numerator =
  * Σ_s lut(q)(s)(code_s) (the query stays full-precision — ADC's
  * point), denominator = |q| · sqrt(Σ_s |c_s,code_s|²) (the
  * reconstruction's exact norm). Per-row work is m·|queries| lookups —
  * the corpus-side scan reads ONLY the m-int code column, never the
  * float embedding.
  */
case class PqAdcCosine(child: Expression, luts: Broadcast[PqAdcLut])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cosine expects array<int> codes, got ${other.catalogString}")
  }

  @transient private lazy val lut: PqAdcLut = luts.value

  /** Public for the generated-code call-through. */
  def cosines(codes: ArrayData): ArrayData = {
    val nq = lut.qids.length
    val m = lut.centNormSq.length
    var rnormSq = 0.0
    var s = 0
    while (s < m) {
      rnormSq += lut.centNormSq(s)(codes.getInt(s))
      s += 1
    }
    val rnorm = math.sqrt(rnormSq)
    val out = new Array[Double](nq)
    var q = 0
    while (q < nq) {
      var num = 0.0
      var t = 0
      val ql = lut.lut(q)
      while (t < m) { num += ql(t)(codes.getInt(t)); t += 1 }
      val den = lut.qnorms(q) * rnorm
      out(q) = if (den == 0.0) 0.0 else num / den
      q += 1
    }
    new GenericArrayData(out)
  }

  def emptyScores(): ArrayData =
    new GenericArrayData(new Array[Double](lut.qids.length))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyScores() else cosines(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this,
      classOf[PqAdcCosine].getName)
    val ad = classOf[ArrayData].getName
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      $ad ${ev.value} = ${childGen.isNull}
        ? $ref.emptyScores()
        : ($ad) $ref.cosines(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "pq_adc_cosine"
}

/** Column-API entry points. */
object PqFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pq_encode(emb: Column, books: Broadcast[PqCodebooks]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb), books))

  def pq_adc_cosine(codes: Column, luts: Broadcast[PqAdcLut]): Column =
    ColumnBridge.column(PqAdcCosine(ColumnBridge.expression(codes), luts))
}
