package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** `gram_hashes(words, n, buckets)`: the 64-bit hashes of a word
  * array's space-joined n-grams, optionally bucketed, as one
  * array<long> — the per-ROW form of the exploded
  * `pmod(xxhash64(concat_ws(" ", slice(ws, i+1, n))), buckets)`
  * pipeline ([[graft.ops.Curation.wordNgrams]] + post-explode hash).
  *
  * Why an expression and not the HOF chain (the
  * [[SimHash64]]/[[MinHashSig]] rationale, guide "per-task work"):
  * `transform(sequence(...), i => concat_ws(...))` evaluates an
  * interpreted lambda per gram with a fresh `slice` array and joined
  * gram STRING per element; this loop builds each gram's bytes once
  * (`UTF8String.concatWs` — the same null-skipping join `concat_ws`
  * performs) and hashes them in place, inside whole-stage codegen.
  *
  * Bit-parity contract (pinned by GramHashParitySpec):
  * [[XXH64.hashUTF8String]](g, 42) is exactly `xxhash64(g)`, and the
  * bucket fold matches `pmod(h, buckets)` for a positive modulus.
  * Gram ORDER is position order, identical to the transform/explode
  * formulation, so fp-sensitive consumers accumulating per-gram terms
  * see the same sequence. Arrays shorter than `n` words yield an
  * empty array (the `wordNgrams` `when(size >= n)` branch); a NULL
  * input also yields an empty array (the split/filter producers here
  * never emit NULL, and empty is the natural "no grams" identity —
  * non-nullable output keeps InferFiltersFromConstraints from
  * manufacturing an isnotnull that re-inlines the tokenizer, see
  * [[SimHash64.nullable]]).
  */
case class GramHashes(child: Expression, n: Int, buckets: Long)
    extends UnaryExpression {

  require(n >= 1, s"gram_hashes: n must be >= 1, got $n")
  require(buckets >= 0,
    s"gram_hashes: buckets must be >= 0 (0 = raw hashes), got $buckets")

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    FingerprintExpressions.requireStringArray(prettyName, child.dataType)

  @transient private lazy val sep = UTF8String.fromString(" ")

  /** Public for the generated-code call-through (see
    * [[SimHash64.simhash]]). */
  def hashes(a: ArrayData): ArrayData = {
    val len = a.numElements()
    val m = len - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val window = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      while (j < n) {
        window(j) = if (a.isNullAt(i + j)) null else a.getUTF8String(i + j)
        j += 1
      }
      // concat_ws skips NULL inputs and yields "" when all are NULL;
      // UTF8String.concatWs implements exactly that. The n == 1 case
      // hashes the word in place (no copy).
      val g =
        if (n == 1) {
          if (window(0) == null) UTF8String.EMPTY_UTF8 else window(0)
        } else UTF8String.concatWs(sep, window: _*)
      val h = XXH64.hashUTF8String(g, 42L)
      out(i) =
        if (buckets > 0) { val r = h % buckets; if (r < 0) r + buckets else r }
        else h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** NULL-input identity: no grams. */
  def emptyHashes(): ArrayData = new GenericArrayData(Array.emptyLongArray)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptyHashes() else hashes(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("gramHashes", this,
      classOf[GramHashes].getName)
    val ad = classOf[ArrayData].getName
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      $ad ${ev.value} = ${childGen.isNull}
        ? $ref.emptyHashes()
        : ($ad) $ref.hashes(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "gram_hashes"
}

/** Column-API entry points. */
object GramHashFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Hashes of the space-joined word n-grams of `words`, bucketed by
    * `pmod(., buckets)` when buckets > 0 (raw xxhash64 when 0). */
  def gram_hashes(words: Column, n: Int, buckets: Long = 0L): Column =
    ColumnBridge.column(
      GramHashes(ColumnBridge.expression(words), n, buckets))
}
