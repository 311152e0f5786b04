package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression `bpe_token_count(text)`: the subword
  * token count of `text` under a trained greedy-BPE merge table
  * ([[graft.ops.Bpe.Merges]]).
  *
  * Same executor-scale design as [[CentroidTopCells]]: the merge
  * table rides ONE explicit broadcast (executor-resident; the plan
  * carries one node regardless of merge-table size — a literal
  * formulation would embed numMerges pair strings in every task
  * binary), and the per-row work happens in a plain JVM method the
  * generated code calls through the referenced expression object, so
  * the surrounding whole-stage codegen span stays intact. Word memo
  * semantics (bounded, executor-wide) live on the broadcast value —
  * shared by every task on the executor, which is where Zipf word
  * reuse pays.
  */
case class BpeTokenCount(child: Expression,
    merges: Broadcast[graft.ops.Bpe.Merges]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count expects string, got ${t.catalogString}")
  }

  /** Public so generated code can call it through the referenced
    * expression object. */
  def countTokens(text: UTF8String): Long =
    merges.value.countText(text.toString)

  override def nullSafeEval(v: Any): Any =
    countTokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokenCount", this,
      classOf[BpeTokenCount].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countTokens($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "bpe_token_count"
}

/** `bpe_tokens(text)`: the ordered subword tokens themselves (array
  * of strings) — the emission sibling of [[BpeTokenCount]] for vocab
  * builds and embedding prep. Same broadcast/codegen design;
  * `size(bpe_tokens(t)) == bpe_token_count(t)` by construction
  * (both route through the same per-word encoder — spec-pinned),
  * and concatenating the tokens reproduces the lowercased text's
  * words (lossless, spec-pinned). */
case class BpeTokens(child: Expression,
    merges: Broadcast[graft.ops.Bpe.Merges]) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType,
      containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_tokens expects string, got ${t.catalogString}")
  }

  /** Public so generated code can call it through the referenced
    * expression object. */
  def tokens(text: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      merges.value.encodeText(text.toString)
        .map(s => UTF8String.fromString(s): Any))

  override def nullSafeEval(v: Any): Any =
    tokens(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTokens", this,
      classOf[BpeTokens].getName)
    val arrayData = "org.apache.spark.sql.catalyst.util.ArrayData"
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = ($arrayData) $ref.tokens($c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "bpe_tokens"
}
