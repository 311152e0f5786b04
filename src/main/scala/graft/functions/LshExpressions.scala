package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression `lsh_signatures(emb)`: the sign-bit
  * hyperplane-LSH signature of one embedding against EVERY table's
  * plane set, returned as `array<long>` (index = table, bit i of the
  * long = sign(v . plane_i)).
  *
  * Design for 1000 executors — same broadcast-not-literals discipline
  * as [[CentroidTopCells]]: the round-7 formulation embedded every
  * plane as `array(lit, lit, ...)` in the plan — tables x planes x dim
  * literal doubles (4 x 8 x 64 = 2048 per side, on BOTH join sides),
  * re-analyzed, re-codegen'd, and shipped in every task binary per
  * query. Production LSH (more tables, higher dims) multiplies that
  * into analyzer/codegen-cache blowup; here the plan carries one node
  * and the planes ride an executor-resident broadcast. All tables are
  * also computed in ONE pass over the vector (the literal form
  * re-entered the array per table).
  *
  * Bit semantics are pinned to the formulation this replaces: per
  * plane, acc = sum over j < min(|v|, dim) of (double) v(j) * p(j)
  * ([[VectorDot]]'s accumulation order), bit set iff acc >= 0 — so
  * signatures, buckets, and every recall measurement are unchanged.
  */
case class LshSignatures(child: Expression,
    planes: Broadcast[Array[Array[Array[Double]]]])
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"lsh_signatures expects array<float|double>, got ${t.catalogString}")
  }

  @transient private lazy val tables: Array[Array[Array[Double]]] =
    planes.value
  @transient private lazy val elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** All table signatures for one vector. Public so generated code can
    * call it through the referenced expression object — per-row work is
    * tables x planes x dim flops, so one virtual call per row is noise
    * and the surrounding whole-stage codegen span stays intact. */
  def signatures(v: ArrayData): ArrayData = {
    val out = new Array[Long](tables.length)
    var t = 0
    while (t < tables.length) {
      val ps = tables(t)
      var sig = 0L
      var i = 0
      while (i < ps.length) {
        val p = ps(i)
        val d = math.min(v.numElements(), p.length)
        var acc = 0.0
        var j = 0
        if (elemIsFloat) {
          while (j < d) { acc += v.getFloat(j).toDouble * p(j); j += 1 }
        } else {
          while (j < d) { acc += v.getDouble(j) * p(j); j += 1 }
        }
        if (acc >= 0) sig |= 1L << i
        i += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any =
    signatures(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSignatures", this,
      classOf[LshSignatures].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $ref.signatures($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "lsh_signatures"
}

/** Column-API entry point for hyperplane-LSH signatures. */
object LshFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Per-table sign-bit signatures of an embedding column, as
    * array<long> indexed by table. */
  def lsh_signatures(emb: Column,
      planes: Broadcast[Array[Array[Array[Double]]]]): Column =
    ColumnBridge.column(
      LshSignatures(ColumnBridge.expression(emb), planes))
}
