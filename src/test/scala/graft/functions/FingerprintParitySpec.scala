package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.ops.Dedup

/** Pins the native fingerprint expressions to the SQL-function
  * formulations they replaced: the rewrite's whole safety argument is
  * bit-parity (LSH band keys, candidate pairs, and recall gates are
  * provably unchanged if and only if every hash matches), so each test
  * recomputes the ROUND-7 explode+agg pipeline inline and compares
  * per-doc values on the real sf0.001 documents table.
  */
class FingerprintParitySpec extends SparkSpec {

  private def real = Tables.documents(spark, sf0001)

  // The pre-rewrite shingle frame, shared by both legacy formulations:
  // withShingles is private to ops, so rebuild it from the public
  // TextAnalysis primitives (same expressions).
  private def shingled(n: Int) = real
    .select(col("doc_id"), graft.ops.TextAnalysis.tokens(col("text")).as("toks"))
    .select(col("doc_id"),
      graft.ops.TextAnalysis.shinglesFromTokens(col("toks"), n).as("sh"))

  test("SimHash64 is bit-identical to the packed explode+agg formulation") {
    val tok = shingled(3)
      .select(col("doc_id"), explode_outer(slice(col("sh"), 1, 32767)).as("t"))
      .filter(col("t").isNotNull)
      .withColumn("h", xxhash64(col("t")))
    val packAggs = (0 until 16).map { k =>
      sum((0 until 4).map { j =>
        shiftrightunsigned(col("h"), 4 * k + j).bitwiseAND(lit(1L)) *
          lit(1L << (16 * j))
      }.reduce(_ + _)).as(s"g$k")
    } :+ count(lit(1)).as("n_sh_tok")
    val voted = tok.groupBy(col("doc_id")).agg(packAggs.head, packAggs.tail: _*)
    val packed = (0 until 64).map { b =>
      val cnt = shiftrightunsigned(col(s"g${b / 4}"), 16 * (b % 4))
        .bitwiseAND(lit(65535L))
      when(cnt * 2 > col("n_sh_tok"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val legacy = voted.select(col("doc_id"), packed.as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val native = Dedup.simHash(real)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native.size == legacy.size && legacy.nonEmpty)
    val diff = native.collect { case (id, h) if legacy(id) != h => id }
    assert(diff.isEmpty, s"simhash mismatch for docs ${diff.take(5)}")
  }

  test("MinHashSig is bit-identical to the explode+min-agg formulation") {
    val numHashes = 32
    val sh = shingled(3)
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .withColumn("h0", xxhash64(col("s")))
    val aggs = (0 until numHashes).map(i =>
      min(xxhash64(col("h0"), lit(i))).as(s"h$i"))
    val legacy = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to numHashes).map(r.getLong).toVector)
      .toMap

    val native = Dedup.minHashSignatures(real, 3, numHashes)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(native.size == legacy.size && legacy.nonEmpty)
    val diff = native.collect { case (id, v) if legacy(id) != v => id }
    assert(diff.isEmpty, s"minhash mismatch for docs ${diff.take(5)}")
  }

  test("fingerprint plans are narrow maps: no exchange, no aggregate, " +
      "one signature eval") {
    val simPlan = Dedup.simHash(real).queryExecution.executedPlan.toString
    assert(!simPlan.contains("Exchange"), s"simHash shuffles:\n$simPlan")
    assert(!simPlan.contains("HashAggregate"), s"simHash aggregates:\n$simPlan")

    // bandTable reads the signature array 32 times via element_at;
    // CollapseProject must NOT inline the non-cheap MinHashSig into
    // each reference — the optimized plan carries exactly one eval.
    val bandPlan = Dedup.bandTable(real).queryExecution.optimizedPlan.toString
    val evals = "minhash_sig".r.findAllIn(bandPlan).size
    assert(evals == 1, s"expected 1 minhash_sig eval, got $evals:\n$bandPlan")
  }

  test("empty and sub-n-token docs keep their round-7 semantics") {
    import spark.implicits._
    // shinglesFromTokens always yields >= 1 element (the whole-text
    // shingle below n tokens), so neither formulation ever drops a doc.
    val odd = Seq((1L, "one two"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    assert(Dedup.simHash(odd).count() == 3)
    val sigs = Dedup.minHashSignatures(odd, 3, 8).collect()
    assert(sigs.length == 3 && sigs.forall(!_.isNullAt(1)))
  }
}
