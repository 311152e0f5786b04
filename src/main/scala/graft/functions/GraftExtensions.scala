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
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def arity(name: String, n: Int, args: Seq[Expression]): Unit =
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")

  /** Constant-int argument of an aggregate's SQL form (k, capacity,
    * threshold): must be a foldable literal at analysis time. */
  private def constInt(name: String, arg: Expression): Int = {
    require(arg.foldable,
      s"$name expects a literal integer, got ${arg.sql}")
    arg.eval() match {
      case i: Int => i
      case l: Long =>
        require(l == l.toInt.toLong,
          s"$name literal out of int range: $l")
        l.toInt
      case other => throw new IllegalArgumentException(
        s"$name expects a literal integer, got $other")
    }
  }

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

  /** The bounded-state aggregates as SQL functions — the analyzer
    * wraps a returned AggregateFunction in its AggregateExpression, so
    * `SELECT uniq_up_to(x, 5) FROM t GROUP BY g` works like any
    * built-in. Size arguments must be literals (they shape the
    * aggregation buffer, which exists before any row is seen). */
  private[functions] val uniqUpToDescriptor =
    (new FunctionIdentifier("uniq_up_to"),
      new ExpressionInfo(
        classOf[graft.ops.UniqUpTo.UniqUpToAgg].getName, "uniq_up_to"),
      (args: Seq[Expression]) => {
        arity("uniq_up_to", 2, args)
        graft.ops.UniqUpTo.UniqUpToAgg(args.head,
          constInt("uniq_up_to", args(1)))
      })

  private[functions] val detSampleDescriptor =
    (new FunctionIdentifier("deterministic_sample"),
      new ExpressionInfo(
        classOf[graft.ops.DetSample.DeterministicSample].getName,
        "deterministic_sample"),
      (args: Seq[Expression]) => {
        arity("deterministic_sample", 3, args)
        graft.ops.DetSample.DeterministicSample(args.head, args(1),
          constInt("deterministic_sample", args(2)))
      })

  /** Constant-double argument (relative error, quantile probability):
    * must be a foldable literal at analysis time. */
  private def constDouble(name: String, arg: Expression): Double = {
    require(arg.foldable,
      s"$name expects a literal double, got ${arg.sql}")
    arg.eval() match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"$name expects a literal double, got $other")
    }
  }

  private[functions] val quantileStateDescriptor =
    (new FunctionIdentifier("quantile_state"),
      new ExpressionInfo(
        classOf[graft.agg.QuantileState.QuantileStateAgg].getName,
        "quantile_state"),
      (args: Seq[Expression]) => {
        arity("quantile_state", 2, args)
        graft.agg.QuantileState.QuantileStateAgg(args.head,
          constDouble("quantile_state", args(1)))
      })

  private[functions] val quantileStateMergeDescriptor =
    (new FunctionIdentifier("quantile_state_merge"),
      new ExpressionInfo(
        classOf[graft.agg.QuantileState.QuantileStateMergeAgg].getName,
        "quantile_state_merge"),
      (args: Seq[Expression]) => {
        arity("quantile_state_merge", 1, args)
        graft.agg.QuantileState.QuantileStateMergeAgg(args.head)
      })

  private[functions] val quantileStateValueDescriptor =
    (new FunctionIdentifier("quantile_state_value"),
      new ExpressionInfo(
        classOf[graft.agg.QuantileState.QuantileStateValue].getName,
        "quantile_state_value"),
      (args: Seq[Expression]) => {
        arity("quantile_state_value", 2, args)
        graft.agg.QuantileState.QuantileStateValue(args.head,
          constDouble("quantile_state_value", args(1)))
      })

  private[functions] val topKWeightedDescriptor =
    (new FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(
        classOf[graft.ops.TopK.SpaceSavingTopK].getName,
        "space_saving_topk"),
      (args: Seq[Expression]) => {
        arity("space_saving_topk", 3, args)
        graft.ops.TopK.SpaceSavingTopK(args.head, args(1),
          constInt("space_saving_topk", args(2)))
      })

  /** CMS surfaces hash the key themselves (engine xxhash64, seed 42 —
    * see [[graft.agg.CountMinState]]), so SQL callers pass raw values
    * and build/probe can never disagree on the hash. */
  private[functions] val cmsStateDescriptor =
    (new FunctionIdentifier("cms_state"),
      new ExpressionInfo(
        classOf[graft.agg.CountMinState.CmsStateAgg].getName,
        "cms_state"),
      (args: Seq[Expression]) => {
        arity("cms_state", 3, args)
        graft.agg.CountMinState.CmsStateAgg(
          graft.agg.CountMinState.hashedExpr(args.head),
          constInt("cms_state", args(1)),
          constInt("cms_state", args(2)))
      })

  private[functions] val cmsStateMergeDescriptor =
    (new FunctionIdentifier("cms_state_merge"),
      new ExpressionInfo(
        classOf[graft.agg.CountMinState.CmsStateMergeAgg].getName,
        "cms_state_merge"),
      (args: Seq[Expression]) => {
        arity("cms_state_merge", 1, args)
        graft.agg.CountMinState.CmsStateMergeAgg(args.head)
      })

  private[functions] val cmsStateQueryDescriptor =
    (new FunctionIdentifier("cms_state_query"),
      new ExpressionInfo(
        classOf[graft.agg.CountMinState.CmsStateQuery].getName,
        "cms_state_query"),
      (args: Seq[Expression]) => {
        arity("cms_state_query", 2, args)
        graft.agg.CountMinState.CmsStateQuery(args.head,
          graft.agg.CountMinState.hashedExpr(args(1)))
      })

  /** Constant-string argument (a needle known at analysis time). */
  private def constString(name: String, arg: Expression): String = {
    require(arg.foldable && arg.dataType ==
      org.apache.spark.sql.types.StringType,
      s"$name expects a literal string, got ${arg.sql}")
    val v = arg.eval()
    require(v != null, s"$name literal string must not be null")
    v.toString
  }

  private[functions] val gramBloomDescriptor =
    (new FunctionIdentifier("gram_bloom"),
      new ExpressionInfo(
        classOf[GramBloom.GramBloomAgg].getName, "gram_bloom"),
      (args: Seq[Expression]) => {
        arity("gram_bloom", 4, args)
        GramBloom.GramBloomAgg(args.head,
          constInt("gram_bloom", args(1)),
          constInt("gram_bloom", args(2)).toLong,
          constDouble("gram_bloom", args(3)))
      })

  private[functions] val gramBloomAdmitsDescriptor =
    (new FunctionIdentifier("gram_bloom_admits"),
      new ExpressionInfo(
        classOf[GramBloom.GramBloomAdmits].getName,
        "gram_bloom_admits"),
      (args: Seq[Expression]) => {
        arity("gram_bloom_admits", 3, args)
        GramBloom.GramBloomAdmits(args.head,
          constString("gram_bloom_admits", args(1)),
          constInt("gram_bloom_admits", args(2)))
      })

  private[functions] val deflateRatioDescriptor =
    (new FunctionIdentifier("deflate_ratio"),
      new ExpressionInfo(classOf[DeflateRatio].getName, "deflate_ratio"),
      (args: Seq[Expression]) => {
        arity("deflate_ratio", 1, args)
        DeflateRatio(args.head)
      })

  private[functions] val groupTopNDescriptor =
    (new FunctionIdentifier("group_top_n"),
      new ExpressionInfo(
        classOf[graft.ops.GroupTopN.GroupTopNAgg].getName,
        "group_top_n"),
      (args: Seq[Expression]) => {
        arity("group_top_n", 3, args)
        graft.ops.GroupTopN.GroupTopNAgg(args.head, args(1),
          constInt("group_top_n", args(2)))
      })

  private[functions] val descriptors = Seq(vecDotDescriptor,
    vecNormDescriptor, uniqUpToDescriptor, detSampleDescriptor,
    topKWeightedDescriptor, quantileStateDescriptor,
    quantileStateMergeDescriptor, quantileStateValueDescriptor,
    cmsStateDescriptor, cmsStateMergeDescriptor,
    cmsStateQueryDescriptor, gramBloomDescriptor,
    gramBloomAdmitsDescriptor, deflateRatioDescriptor,
    groupTopNDescriptor)

  /** Register on an already-built session (tests, driver-owned
    * sessions where spark.sql.extensions can't be set). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach {
      case (ident, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(ident, info, builder)
    }
}
