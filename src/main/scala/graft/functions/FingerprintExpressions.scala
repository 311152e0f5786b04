package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Shuffle-free per-document fingerprints.
  *
  * SimHash and MinHash are per-document reductions, but the round-1..7
  * formulations computed them as explode + groupBy — one row per
  * shingle through the exchange-adjacent agg machinery (map-side
  * combine kept the SHUFFLE small, but every shingle still paid the
  * hash-map agg-buffer update, and the plan carried a generate + an
  * aggregate where a map suffices). These expressions compute the
  * whole fingerprint in one tight loop per row, so corpus
  * fingerprinting becomes a narrow codegen'd projection over the scan:
  * at 100 TB there is NO aggregation state at all — each task streams
  * documents through and emits (doc_id, fingerprint).
  *
  * Bit-parity contract (pinned by FingerprintParitySpec): every hash
  * matches the `xxhash64(...)` SQL formulation it replaces —
  * [[XXH64.hashUTF8String]](s, 42) is exactly `xxhash64(s)` on a
  * UTF8_BINARY string column, and the minhash permutation chain
  * hashInt(i, hashLong(h0, 42)) is exactly `xxhash64(h0, i)` (seed 42,
  * children folded left). LSH band keys, candidate pairs, and every
  * recall gate are therefore unchanged.
  */
object FingerprintExpressions {
  private[functions] def requireStringArray(
      name: String, t: DataType): TypeCheckResult = t match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name expects array<string>, got ${other.catalogString}")
  }
}

/** `simhash64(shingles)`: 64-bit SimHash of a (distinct) shingle
  * array — per-bit majority vote over xxhash64(shingle), bit b set iff
  * 2 * count_set(b) > n. Votes stop after `maxShingles` elements
  * (deterministic truncation, same cap as the packed-agg formulation
  * it replaces — kept so fingerprints are stable against it even
  * though the JVM loop has no overflow constraint).
  */
case class SimHash64(child: Expression, maxShingles: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  /** Deliberately NON-nullable, with a defined identity for a NULL
    * input (0L — the zero-vote fingerprint, unreachable from
    * shinglesFromTokens). This is load-bearing for the plan, not
    * cosmetics: a nullable fingerprint in a self-join key lets
    * InferFiltersFromConstraints add `isnotnull(fingerprint)` and push
    * it BELOW the producing projection with the whole shingle pipeline
    * re-inlined — where the tokenizer, no longer a bound attribute,
    * re-runs per element_at reference (measured: 18.2 s vs 0.7 s for
    * dedup_simhash at sf0.1). Non-nullable output means the optimizer
    * never manufactures that filter.
    */
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    FingerprintExpressions.requireStringArray(prettyName, child.dataType)

  /** Public so generated code can call through the referenced
    * expression object (same pattern as [[LshSignatures.signatures]]):
    * per-row work is |shingles| x 64 bit-votes, one virtual call per
    * row is noise, and the surrounding whole-stage codegen span stays
    * intact. */
  def simhash(a: ArrayData): Long = {
    val cap = math.min(a.numElements(), maxShingles)
    val votes = new Array[Int](64)
    var n = 0
    var i = 0
    while (i < cap) {
      if (!a.isNullAt(i)) {
        val h = XXH64.hashUTF8String(a.getUTF8String(i), 42L)
        n += 1
        var b = 0
        while (b < 64) {
          votes(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) * 2 > n) out |= 1L << b
      b += 1
    }
    out
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else simhash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this,
      classOf[SimHash64].getName)
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = ${childGen.isNull} ? 0L
        : $ref.simhash(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "simhash64"
}

/** `minhash_sig(shingles, k)`: the k-permutation MinHash signature of
  * a (distinct) shingle array as array<long>. Permutation i of shingle
  * s is xxhash64(xxhash64(s), i) — each shingle's string bytes are
  * hashed ONCE, then k cheap long-rehashes (the same
  * one-string-hash-then-rehash scheme the agg formulation used).
  * An empty (or all-null) input yields a Long.MaxValue-filled
  * signature — unreachable from [[graft.ops.TextAnalysis
  * .shinglesFromTokens]] (always >= 1 element) but well-defined: the
  * identity of the element-wise min this computes.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  /** Non-nullable with a defined NULL-input identity (the
    * Long.MaxValue-filled signature — the min's identity) for the same
    * inferred-isnotnull-pushdown reason as [[SimHash64.nullable]]. */
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    FingerprintExpressions.requireStringArray(prettyName, child.dataType)

  /** Public for the generated-code call-through (see
    * [[SimHash64.simhash]]). */
  def signature(a: ArrayData): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i)) {
        val h0 = XXH64.hashUTF8String(a.getUTF8String(i), 42L)
        // xxhash64(h0, i) = hashInt(i, hashLong(h0, 42)): the long
        // half of the chain is shingle-only, so it hoists out of the
        // permutation loop.
        val base = XXH64.hashLong(h0, 42L)
        var k = 0
        while (k < numHashes) {
          val hk = XXH64.hashInt(k, base)
          if (hk < out(k)) out(k) = hk
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The NULL-input signature: element-wise-min identity. A fresh
    * array per call — consumers may hold references across rows. */
  def emptySignature(): ArrayData = {
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) emptySignature()
    else signature(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this,
      classOf[MinHashSig].getName)
    val ad = classOf[ArrayData].getName
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      $ad ${ev.value} = ${childGen.isNull}
        ? $ref.emptySignature()
        : ($ad) $ref.signature(${childGen.value});""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

/** Column-API entry points. */
object FingerprintFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  def simhash64(shingles: Column, maxShingles: Int): Column =
    ColumnBridge.column(
      SimHash64(ColumnBridge.expression(shingles), maxShingles))

  def minhash_sig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(
      MinHashSig(ColumnBridge.expression(shingles), numHashes))
}
