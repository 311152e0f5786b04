package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SignatureStoreSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog while birds sing in trees"),
    (2L, "completely unrelated text about databases and distributed query engines"),
    (3L, "a third document with its own entirely distinct vocabulary and phrasing")
  ).toDF("doc_id", "text")

  test("incoming near-dup of a stored doc is detected; novel docs kept") {
    val path = tmpDir("sigstore") + "/store"
    SignatureStore.build(corpus, path)
    assert(SignatureStore.storeSize(spark, path) == 3 * 8) // 8 bands per doc

    val incoming = Seq(
      // near-dup of doc 1: exact copy + one appended word -> jaccard
      // n/(n+1) ~ 0.92, inside the 8x4 banding design regime
      (10L, "the quick brown fox jumps over the lazy dog while birds sing in trees today"),
      (11L, "brand new content that matches nothing already present in the corpus")
    ).toDF("doc_id", "text")
    val (kept, dups) = SignatureStore.ingest(incoming, corpus, path)

    val dupRows = dups.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(dupRows.map(d => (d._1, d._2)).toSeq == Seq((10L, 1L)),
      s"expected 10 ~ 1, got ${dupRows.mkString(",")}")
    assert(dupRows.head._3 >= 0.8)
    assert(kept.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(11L))
    // only the kept doc's signatures were appended
    assert(SignatureStore.storeSize(spark, path) == 4 * 8)
  }

  test("second arrival dedupes against docs appended by the first") {
    val path = tmpDir("sigstore2") + "/store"
    SignatureStore.build(corpus, path)
    val b1 = Seq(
      (20L, "fresh first-batch material never seen before in any stored document"))
      .toDF("doc_id", "text")
    SignatureStore.ingest(b1, corpus, path)

    // batch 2 duplicates the doc KEPT from batch 1 — the store, not the
    // original corpus table, must catch it; the text side for verify is
    // the union view a caller maintains as the corpus grows
    val grown = corpus.union(b1)
    val b2 = Seq(
      (30L, "fresh first-batch material never seen before in any stored document whatsoever"),
      (31L, "yet another genuinely novel document arriving in the second batch"))
      .toDF("doc_id", "text")
    val (kept2, dups2) = SignatureStore.ingest(b2, grown, path)
    assert(dups2.select("doc_id", "dup_of").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((30L, 20L)))
    assert(kept2.select("doc_id").collect().map(_.getLong(0)).toSeq
      == Seq(31L))
  }

  test("probe plan broadcasts the incoming side, not the store") {
    val path = tmpDir("sigstore3") + "/store"
    SignatureStore.build(corpus, path)
    val incoming = Seq((40L, "some arriving text")).toDF("doc_id", "text")
    val plan = SignatureStore.dedupeIncoming(incoming, corpus, path)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"store probe should be a broadcast hash join:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }
}
