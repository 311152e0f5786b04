package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Persisted IVF index: probes are partition-pruned, results match the
  * ad-hoc ivfTopK dataflow, recall vs brute force is sane.
  */
class VectorIndexSpec extends SparkSpec {

  test("build once, query with partition-pruned probes; recall holds") {
    val corpus = Tables.embeddings(spark, sf0001)
    val path = tmpDir("ivf") + "/index"
    VectorIndex.buildIvf(corpus, path, numCells = 8, refineIters = 1)

    // centroids table is tiny and complete
    assert(spark.read.parquet(s"$path/centroids").count() == 8)
    // every corpus vector landed in exactly one cell
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())

    val queries = corpus.filter(col("vec_id") < 5)
    val hits = VectorIndex.queryIvf(spark, path, queries, k = 10,
      nProbe = 3)

    // the probe scan is partition-pruned: the cells read < cells total
    val scan = hits.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [cell#"),
      s"no partition pruning on the probe scan:\n$scan")

    // recall vs brute force at the same k
    val exact = Similarity.bruteForceTopK(queries, corpus, 10)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = hits.select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low")

    // and the persisted-index path agrees with the ad-hoc dataflow at
    // the same parameters (same seeds, same refinement)
    val adhoc = Similarity.ivfTopK(queries, corpus, 10, numCells = 8,
        nProbe = 3, refineIters = 1)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(approx == adhoc)
  }

  test("incremental append: new vectors land in cells and are findable") {
    val corpus = Tables.embeddings(spark, sf0001)
    val base = corpus.filter(col("vec_id") % 2 === 0)
    val delta = corpus.filter(col("vec_id") % 2 === 1)
    val path = tmpDir("ivf-append") + "/index"
    VectorIndex.buildIvf(base, path, numCells = 8, refineIters = 1)
    VectorIndex.appendIvf(delta, path)

    // index now holds the full corpus, centroids untouched
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())
    assert(spark.read.parquet(s"$path/centroids").count() == 8)
    // the refreshed fingerprint makes ensureIvf treat the grown index
    // as current (no rebuild wiping the appended half)
    VectorIndex.ensureIvf(corpus, path, numCells = 8)
    assert(spark.read.parquet(s"$path/cells").count() == corpus.count())

    // appended vectors are retrievable: querying ALL cells must surface
    // exactly the brute-force top-k over the full corpus
    val queries = corpus.filter(col("vec_id") < 3)
    val full = VectorIndex.queryIvf(spark, path, queries, k = 5,
        nProbe = 8)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(queries, corpus, 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact,
      "full-probe query after append must equal brute force")
  }
}
