package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate `bloom_might_contain(key)` over a
  * broadcast [[BloomFilter]] — the runtime-filter primitive behind
  * [[graft.ops.BloomPrune]].
  *
  * Design for 1000 executors: the filter rides an explicit torrent
  * broadcast (one copy per executor), NOT the expression tree (which
  * serializes into every task binary — at 100 M keys / 1% fpp the
  * filter is ~120 MB and per-task shipping would dominate). Codegen
  * references the broadcast object and calls `mightContainLong`
  * directly, so the probe stays inside the whole-stage-codegen span of
  * the scan it prunes — no virtual dispatch, no row materialization.
  *
  * Long keys only: `DataFrameStatFunctions.bloomFilter` inserts
  * integral columns via `putLong`, so the probe must hash identically
  * (`mightContainLong`). A false positive is filtered by the exact
  * join that follows; a false negative is impossible — so plans built
  * on this predicate stay exact.
  */
case class BloomMightContainLong(child: Expression,
    filter: Broadcast[BloomFilter]) extends UnaryExpression with Predicate {

  // BIGINT only, enforced at analysis: the interpreted path casts to
  // Long while generated code would silently widen an int — requiring
  // LongType keeps both execution modes identical (callers cast
  // narrower integrals explicitly, which is also what the insert-side
  // `putLong` hashing assumes).
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain requires a BIGINT key, got " +
        child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any =
    filter.value.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomBcast", filter,
      classOf[Broadcast[BloomFilter]].getName)
    defineCodeGen(ctx, ev, c =>
      s"((${classOf[BloomFilter].getName}) $ref.value()).mightContainLong($c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}

/** Column-API entry point for the bloom predicate. */
object BloomFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def bloom_might_contain(key: Column,
      filter: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(
      BloomMightContainLong(ColumnBridge.expression(key), filter))
}
