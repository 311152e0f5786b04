package graft.query

import graft.SparkSpec
import graft.ops.Bpe

/** Pins the dynamic-oracle plumbing: the soundness guard that refuses
  * to emit a replay for symbols that would break the wrapped-string
  * encoding, and the snapshot-keyed availability contract (no trained
  * table -> no oracle -> rows-only fallback, never a wrong oracle).
  * The replay's VALUE correctness is gated end-to-end by the driver's
  * DuckDB compare (and locally by tools/check_oracle.py) — this spec
  * covers only what that compare cannot see: the refusal paths.
  */
class BpeOracleSpec extends SparkSpec {

  test("safe() rejects symbols that would break the wrapped replay") {
    assert(BpeOracle.safe(Bpe.Merges(Array(("a", "b"), ("ab", "c")))))
    assert(!BpeOracle.safe(Bpe.Merges(Array.empty))) // nothing trained
    assert(!BpeOracle.safe(Bpe.Merges(Array(("a|", "b"))))) // separator
    assert(!BpeOracle.safe(Bpe.Merges(Array(("a'", "b"))))) // SQL quote
    assert(!BpeOracle.safe(Bpe.Merges(Array(("a b", "c"))))) // space
    assert(!BpeOracle.safe(
      Bpe.Merges(Array((0.toChar.toString, "b"))))) // control char
    assert(!BpeOracle.safe(
      Bpe.Merges(Array(("\ud83d", "\ude00"))))) // surrogate halves
  }

  test("forKey is None for untrained keys; Some (with the exported " +
      "VALUES) once the session trained that corpus") {
    assert(BpeOracle.forKey("/no/such/dir").isEmpty)
    val docs = graft.Tables.documents(spark, sf0001)
    Bpe.ensureMerges(spark, docs, key = sf0001)
    val m = Bpe.snapshotFor(sf0001)
    assert(m.nonEmpty && m.get.pairs.nonEmpty)
    assert(BpeOracle.forKey(sf0001).nonEmpty)
    val sql = BpeOracle.encCtes(m.get)
    val (a, b) = m.get.pairs.head
    assert(sql.contains(s"(0, '$a', '$b')"))
    assert(sql.contains(s"e.r < ${m.get.pairs.length}"))
  }

  test("forKey refuses a corpus whose WORDS would break the replay, " +
      "even when every trained symbol is clean (round-12 ADVICE)") {
    import spark.implicits._
    // a standalone '|' token survives the \s+ split but never enters
    // the trained top-vocab symbols — the replay would still wrap it,
    // and its '||'-count arithmetic would read 2 tokens where the
    // encoder reads 1 (a false hash-gate failure, not a wrong answer)
    val key = "mem:bpe-unsafe-corpus"
    val docs = Seq(
      (1L, "the quick fox | jumps the fox"),
      (2L, "the lazy dog naps the dog"))
      .toDF("doc_id", "text")
    Bpe.ensureMerges(spark, docs, key = key)
    val snap = Bpe.snapshotFor(key)
    assert(snap.nonEmpty && BpeOracle.safe(snap.get),
      "trained symbols should be clean here — the corpus is the problem")
    assert(Bpe.replaySnapshotFor(key).isEmpty)
    assert(BpeOracle.forKey(key).isEmpty)
    // a clean corpus with the same shape stays oracle-eligible
    val cleanKey = "mem:bpe-clean-corpus"
    Bpe.ensureMerges(spark, Seq(
      (1L, "the quick fox jumps the fox"),
      (2L, "the lazy dog naps the dog")).toDF("doc_id", "text"),
      key = cleanKey)
    assert(Bpe.replaySnapshotFor(cleanKey).nonEmpty)
    assert(BpeOracle.forKey(cleanKey).nonEmpty)
  }

  test("the corpus guard also refuses the two engine-divergence " +
      "classes invisible to a lone-surrogate check: supplementary " +
      "chars (UTF-16 units vs codepoints) and U+000B (Java-vs-RE2 " +
      "whitespace split)") {
    import spark.implicits._
    // a VALID astral char: one codepoint to DuckDB's (.), two UTF-16
    // units to the encoder — rlike matches codepoints, so the bare
    // surrogate range never sees it (review-caught)
    val astralKey = "mem:bpe-astral-corpus"
    Bpe.ensureMerges(spark, Seq(
      (1L, "the quick a" + new String(Character.toChars(0x1D569)) +
        "b fox the fox"),
      (2L, "the lazy dog naps the dog")).toDF("doc_id", "text"),
      key = astralKey)
    assert(Bpe.replaySnapshotFor(astralKey).isEmpty,
      "supplementary-plane corpus word must stay rows-only")
    // U+000B: Java \s+ splits it away (the probe's tokens never
    // contain it) but RE2/DuckDB \s+ does NOT split on it — the two
    // engines build different word sets, so the guard must read the
    // RAW text (review-caught)
    val vtabKey = "mem:bpe-vtab-corpus"
    Bpe.ensureMerges(spark, Seq(
      (1L, "the quick fox" + 0x0B.toChar + "jumps the fox"),
      (2L, "the lazy dog naps the dog")).toDF("doc_id", "text"),
      key = vtabKey)
    assert(Bpe.replaySnapshotFor(vtabKey).isEmpty,
      "split-divergent raw text must stay rows-only")
  }
}
