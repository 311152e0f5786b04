package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Sqrt}

/** SparkSessionExtensions entry point: registers the engine's custom
  * expressions as SQL functions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works next to the Column
  * API. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or call [[GraftExtensions.register]] on an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.vecDotDescriptor)
    ext.injectFunction(GraftExtensions.vecNormDescriptor)
  }
}

object GraftExtensions {
  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  private[functions] val vecDotDescriptor =
    (new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        arity("vec_dot", 2, args)
        VectorDot(args.head, args(1))
      })

  private[functions] val vecNormDescriptor =
    (new FunctionIdentifier("vec_norm"),
      new ExpressionInfo(classOf[VectorDot].getName, "vec_norm"),
      (args: Seq[Expression]) => {
        arity("vec_norm", 1, args)
        Sqrt(VectorDot(args.head, args.head))
      })

  /** Register on an already-built session (tests, driver-owned
    * sessions where spark.sql.extensions can't be set). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(vecDotDescriptor, vecNormDescriptor).foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(ident, info, builder)
    }
}
