package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType}

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
    centNormSq: Array[Array[Double]]) extends Serializable {
  // codes persist as ONE byte per sub-space (the whole point of PQ at
  // 100 TB is the scan-byte budget: m bytes vs 4m-and-overhead for an
  // int array); k beyond a byte would silently alias codes
  require(k <= 256, s"pq: k=$k codes do not fit byte-packed storage")
}

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

/** `pq_encode(emb)`: the m sub-space codes of one embedding,
  * BYTE-PACKED as `binary` (one unsigned byte per sub-space; k ≤ 256
  * enforced by [[PqCodebooks]]) — at 100 TB the compressed scan IS
  * the point of PQ, and an array<int> layout read ~4 B + array
  * overhead per code where the information content is one byte. Per
  * sub-space: argmin_j |v_s - c_sj|², computed as argmin of
  * (|c_sj|² - 2 v_s·c_sj) so the vector's own norm never enters;
  * ties break to the lowest index (deterministic). Codebooks ride ONE
  * broadcast probed per row — same broadcast-not-literals discipline
  * as [[CentroidTopCells]] / [[LshSignatures]].
  *
  * Non-nullable with a defined NULL-input identity (all-zero codes):
  * a nullable code column in a join key invites the
  * inferred-isnotnull re-inlining pushdown documented on
  * [[SimHash64.nullable]].
  */
case class PqEncode(child: Expression, books: Broadcast[PqCodebooks])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType

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
  def encode(v: ArrayData): Array[Byte] = {
    val codes = new Array[Byte](cb.m)
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
      codes(s) = best.toByte // k <= 256: unsigned byte, read back & 0xff
      s += 1
    }
    codes
  }

  def emptyCodes(): Array[Byte] = new Array[Byte](cb.m)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyCodes() else encode(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this,
      classOf[PqEncode].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      byte[] ${ev.value} = ${childGen.isNull}
        ? $ref.emptyCodes()
        : $ref.encode(${childGen.value});""",
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
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_cosine expects byte-packed binary codes, got " +
        other.catalogString)
  }

  @transient private lazy val lut: PqAdcLut = luts.value

  /** Public for the generated-code call-through. Codes are unsigned
    * bytes ([[PqEncode]]). */
  def cosines(codes: Array[Byte]): ArrayData = {
    val nq = lut.qids.length
    val m = lut.centNormSq.length
    var rnormSq = 0.0
    var s = 0
    while (s < m) {
      rnormSq += lut.centNormSq(s)(codes(s) & 0xff)
      s += 1
    }
    val rnorm = math.sqrt(rnormSq)
    val out = new Array[Double](nq)
    var q = 0
    while (q < nq) {
      var num = 0.0
      var t = 0
      val ql = lut.lut(q)
      while (t < m) { num += ql(t)(codes(t) & 0xff); t += 1 }
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
    if (v == null) emptyScores()
    else cosines(v.asInstanceOf[Array[Byte]])
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

/** Broadcast payload for residual (IVF-PQ / IVFADC) encoding: the
  * sub-space codebooks were trained on RESIDUALS v - c_cell, so the
  * encoder must subtract the row's cell centroid (indexed by cell id)
  * before quantizing. */
case class IvfPqBooks(books: PqCodebooks,
    cellCents: Array[Array[Double]]) extends Serializable

/** `ivfpq_encode(emb, cell)`: residual PQ codes — quantize
  * v - c_cell against the residual codebooks. Same argmin/tie/null/
  * byte-packing discipline as [[PqEncode]]. */
case class IvfPqEncode(left: Expression, right: Expression,
    payload: Broadcast[IvfPqBooks])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = BinaryType

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _),
          IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivfpq_encode expects (array<float|double>, int), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val p: IvfPqBooks = payload.value
  @transient private lazy val elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Public for the generated-code call-through. */
  def encode(v: ArrayData, cell: Int): Array[Byte] = {
    val cb = p.books
    require(cell >= 0 && cell < p.cellCents.length,
      s"ivfpq_encode: cell $cell outside the ${p.cellCents.length}-cell " +
        "centroid table — stale index or wrong layout")
    val cent = p.cellCents(cell)
    val codes = new Array[Byte](cb.m)
    val n = v.numElements()
    var s = 0
    while (s < cb.m) {
      val base = s * cb.subDim
      var best = 0
      var bestScore = Double.MaxValue
      var j = 0
      while (j < cb.k) {
        val c = cb.cents(s)(j)
        var score = 0.0
        var d = 0
        while (d < cb.subDim) {
          val vi =
            if (base + d >= n) 0.0
            else if (elemIsFloat) v.getFloat(base + d).toDouble
            else v.getDouble(base + d)
          val diff = vi - cent(base + d) - c(d)
          score += diff * diff
          d += 1
        }
        if (score < bestScore) { bestScore = score; best = j }
        j += 1
      }
      codes(s) = best.toByte
      s += 1
    }
    codes
  }

  def emptyCodes(): Array[Byte] = new Array[Byte](p.books.m)

  override def eval(input: InternalRow): Any = {
    val v = left.eval(input)
    val c = right.eval(input)
    if (v == null || c == null) emptyCodes()
    else encode(v.asInstanceOf[ArrayData], c.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqEncode", this,
      classOf[IvfPqEncode].getName)
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      byte[] ${ev.value} = (${lGen.isNull} || ${rGen.isNull})
        ? $ref.emptyCodes()
        : $ref.encode(${lGen.value}, ${rGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivfpq_encode"
}

/** Broadcast payload for residual ADC scoring. Per query q and row
  * (cell, codes): cosine =
  *   (qdotcell(q)(cell) + Σ_s lutR(q)(s)(code_s))
  *   / (qnorm(q) · sqrt(cellNormSq(cell) + Σ_s rnormPart(cell)(s)(code_s)))
  * where rnormPart(cell)(s)(j) = 2·dot(c_cell_sub_s, r_sj) + |r_sj|² —
  * so the denominator is the EXACT norm of the reconstruction
  * c_cell + r̂ (sub-spaces are disjoint coordinates; the cross term is
  * precomputed per (cell, s, j) on the driver).
  */
case class IvfPqLut(qids: Array[Long], qnorms: Array[Double],
    qdotcell: Array[Array[Double]],
    lutR: Array[Array[Array[Double]]],
    rnormPart: Array[Array[Array[Double]]],
    cellNormSq: Array[Double]) extends Serializable

/** `ivfpq_adc_cosine(cell, codes)`: every query's residual-ADC cosine
  * for one encoded row — m+1 lookups per query, float embeddings never
  * read. */
case class IvfPqAdcCosine(left: Expression, right: Expression,
    luts: Broadcast[IvfPqLut])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, BinaryType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"ivfpq_adc_cosine expects (int, binary codes), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  @transient private lazy val lut: IvfPqLut = luts.value

  /** Public for the generated-code call-through. Codes are unsigned
    * bytes ([[IvfPqEncode]]). */
  def cosines(cell: Int, codes: Array[Byte]): ArrayData = {
    require(cell >= 0 && cell < lut.cellNormSq.length,
      s"ivfpq_adc_cosine: cell $cell outside the " +
        s"${lut.cellNormSq.length}-cell table")
    val m = lut.rnormPart(cell).length
    var rnormSq = lut.cellNormSq(cell)
    var s = 0
    while (s < m) {
      rnormSq += lut.rnormPart(cell)(s)(codes(s) & 0xff)
      s += 1
    }
    // FP cancellation can push a near-zero reconstructed norm a hair
    // negative; clamp — the zero-norm guard below handles the rest.
    val rnorm = math.sqrt(math.max(0.0, rnormSq))
    val nq = lut.qids.length
    val out = new Array[Double](nq)
    var q = 0
    while (q < nq) {
      var num = lut.qdotcell(q)(cell)
      val ql = lut.lutR(q)
      var t = 0
      while (t < m) { num += ql(t)(codes(t) & 0xff); t += 1 }
      val den = lut.qnorms(q) * rnorm
      out(q) = if (den == 0.0) 0.0 else num / den
      q += 1
    }
    new GenericArrayData(out)
  }

  def emptyScores(): ArrayData =
    new GenericArrayData(new Array[Double](lut.qids.length))

  override def eval(input: InternalRow): Any = {
    val c = left.eval(input)
    val v = right.eval(input)
    if (v == null || c == null) emptyScores()
    else cosines(c.asInstanceOf[Int], v.asInstanceOf[Array[Byte]])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfPqAdc", this,
      classOf[IvfPqAdcCosine].getName)
    val ad = classOf[ArrayData].getName
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      $ad ${ev.value} = (${lGen.isNull} || ${rGen.isNull})
        ? $ref.emptyScores()
        : ($ad) $ref.cosines(${lGen.value}, ${rGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "ivfpq_adc_cosine"
}

/** Column-API entry points. */
object PqFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def pq_encode(emb: Column, books: Broadcast[PqCodebooks]): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb), books))

  def pq_adc_cosine(codes: Column, luts: Broadcast[PqAdcLut]): Column =
    ColumnBridge.column(PqAdcCosine(ColumnBridge.expression(codes), luts))

  def ivfpq_encode(emb: Column, cell: Column,
      payload: Broadcast[IvfPqBooks]): Column =
    ColumnBridge.column(IvfPqEncode(ColumnBridge.expression(emb),
      ColumnBridge.expression(cell), payload))

  def ivfpq_adc_cosine(cell: Column, codes: Column,
      luts: Broadcast[IvfPqLut]): Column =
    ColumnBridge.column(IvfPqAdcCosine(ColumnBridge.expression(cell),
      ColumnBridge.expression(codes), luts))
}
