package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native Catalyst expression `centroid_top_cells(emb)`: the indices of
  * the `nProbe` nearest centroids (by dot/|c| affinity, descending;
  * index ascending on ties), for IVF cell assignment and probe-set
  * selection.
  *
  * Design for 1000 executors — and for LARGE centroid sets: the
  * centroid matrix rides an explicit broadcast (one copy per
  * executor), NOT the expression tree. The previous formulation built
  * `array(lit(c_00), lit(c_01), ...)` per centroid — numCells x dim
  * literal doubles embedded in the PLAN, fine at 16 x 64 but an
  * analyzer/serialization blowup at SemDeDup production scale (50 k
  * cells x 768+ dims would be tens of millions of plan literals,
  * shipped in every task binary). Here the plan carries one node
  * regardless of numCells; the scoring loop runs over the
  * executor-resident broadcast value.
  *
  * Affinity/tie semantics are pinned to the literal formulation they
  * replace (same double accumulation order as [[VectorDot]], first
  * index wins ties), so cell assignments are bit-identical.
  */
case class CentroidTopCells(child: Expression,
    centroids: Broadcast[Array[Array[Double]]], nProbe: Int)
    extends UnaryExpression {
  require(nProbe > 0, "nProbe must be positive")

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"centroid_top_cells expects array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val cents: Array[Array[Double]] = centroids.value
  @transient private lazy val norms: Array[Double] =
    cents.map(c => math.sqrt(c.map(x => x * x).sum))
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Top-`nProbe` centroid indices for one vector. Public so generated
    * code can call it through the referenced expression object — the
    * per-row work is numCells x dim flops, so one virtual call per row
    * is noise, and the surrounding whole-stage codegen span stays
    * intact. */
  def topCells(v: ArrayData): ArrayData = {
    val k = cents.length
    val n = math.min(nProbe, k)
    // bounded insertion into a (score desc, index asc)-sorted top-n
    // buffer: O(k x n), no per-row allocation beyond the result
    val topIdx = new Array[Int](n)
    val topScore = new Array[Double](n)
    var filled = 0
    var i = 0
    while (i < k) {
      val c = cents(i)
      val d = math.min(v.numElements(), c.length)
      var acc = 0.0
      var j = 0
      if (elemIsFloat) {
        while (j < d) { acc += v.getFloat(j).toDouble * c(j); j += 1 }
      } else {
        while (j < d) { acc += v.getDouble(j) * c(j); j += 1 }
      }
      val score = acc / norms(i)
      // strictly-greater displacement preserves first-index-wins ties
      var pos = filled
      while (pos > 0 && score > topScore(pos - 1)) pos -= 1
      if (pos < n) {
        val last = math.min(filled, n - 1)
        var m = last
        while (m > pos) {
          topIdx(m) = topIdx(m - 1); topScore(m) = topScore(m - 1); m -= 1
        }
        topIdx(pos) = i
        topScore(pos) = score
        if (filled < n) filled += 1
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(topIdx, filled))
  }

  override def nullSafeEval(v: Any): Any =
    topCells(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidTopCells", this,
      classOf[CentroidTopCells].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.topCells($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "centroid_top_cells"
}

/** Column-API entry points for centroid assignment. */
object CentroidFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Indices of the `nProbe` nearest centroids for an embedding column,
    * best first. */
  def centroid_top_cells(emb: Column,
      cents: Broadcast[Array[Array[Double]]], nProbe: Int): Column =
    ColumnBridge.column(
      CentroidTopCells(ColumnBridge.expression(emb), cents, nProbe))

  /** Index of the single nearest centroid (the IVF cell id). */
  def centroid_cell(emb: Column,
      cents: Broadcast[Array[Array[Double]]]): Column =
    org.apache.spark.sql.functions.element_at(
      centroid_top_cells(emb, cents, 1), 1)
}
