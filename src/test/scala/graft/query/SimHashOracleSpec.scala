package graft.query

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Guard pins for the dynamic SimHash oracle: the hash replay itself
  * is gated by the oracle sweep (the driver's DuckDB compare — green
  * at sf0.001/0.01/0.1); what needs a spec is that the SOUNDNESS
  * probe refuses every corpus the unrolled SQL can't replay, so a
  * guard miss can never emit a wrong oracle (the BpeOracle
  * discipline). */
class SimHashOracleSpec extends SparkSpec {

  private def docsOf(texts: Seq[String]) = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
  }

  test("the real corpora pass the probe — the oracle is emitted") {
    assert(SimHashOracle.sound(spark, sf0001))
    // and through the public entry (active session present in specs)
    assert(SimHashOracle.forCorpus(sf0001).nonEmpty)
    assert(SimHashOracle.sql.contains("xor"))
  }

  test("non-ASCII text is refused (ord-as-byte only holds for " +
      "single-byte chars)") {
    assert(!SimHashOracle.soundDocs(docsOf(Seq(
      "plain words here", "café au lait"))))
  }

  test("a control char outside the Java/RE2-agreeing \\s subset is " +
      "refused (\\x0B is Java-\\s but not RE2-\\s)") {
    assert(!SimHashOracle.soundDocs(docsOf(Seq(
      "fine text", "vertical\u000Btab"))))
  }

  test("NULL text is refused") {
    import spark.implicits._
    val docs = Seq((0L, "ok words here"), (1L, null: String))
      .toDF("doc_id", "text")
    assert(!SimHashOracle.soundDocs(docs))
  }

  test("a >= 32-byte shingle is refused (the unrolled hash has no " +
      "stripe loop)") {
    assert(!SimHashOracle.soundDocs(docsOf(Seq(
      "exceedinglylong tokens thatoverflowthestripeboundary"))))
    // boundary: 31 bytes is fine
    assert(SimHashOracle.soundDocs(docsOf(Seq(
      "abcdefghi abcdefghi abcdefghi"))))
  }

  test("a doc past the 32767-shingle vote cap is refused") {
    // 33000 distinct tokens -> 32998 distinct shingles > 32767
    val big = (0 until 33000).map(i => s"t$i").mkString(" ")
    assert(!SimHashOracle.soundDocs(docsOf(Seq(big))))
  }
}
