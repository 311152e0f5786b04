package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding-similarity hot path.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a,b,*),0.0,+)`) allocates a lambda frame per
  * element per row; on an all-pairs similarity join that is the entire
  * runtime (measured 112 s for 2 M pairs x 64 dims at sf0.1). This
  * expression compiles to a primitive fused multiply-add loop inside
  * whole-stage codegen — the plan stays one WholeStageCodegen span with
  * no virtual calls per element.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"vec_dot expects array<float|double>, got $t")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xi = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xi * yi
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$lGet($i) * (double)$b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)

  override def prettyName: String = "vec_dot"
}

/** Column-API entry points for the vector expressions. */
object VectorFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** Dot product of two array<float|double> columns, in double. */
  def vec_dot(a: Column, b: Column): Column =
    ColumnBridge.column(VectorDot(expr(a), expr(b)))

  /** L2 norm of a vector column. */
  def vec_norm(a: Column): Column = {
    val e = expr(a)
    ColumnBridge.column(
      org.apache.spark.sql.catalyst.expressions.Sqrt(VectorDot(e, e)))
  }
}
