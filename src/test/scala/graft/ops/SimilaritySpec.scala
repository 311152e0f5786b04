package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine on known vectors") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0),
      (Array(3f, 4f), Array(3f, 4f), 1.0)
    ).toDF("a", "b", "expected")
    val got = df.select(Similarity.cosine(col("a"), col("b")), col("expected"))
      .collect()
    got.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9))
  }

  test("bruteForceTopK matches a driver-side recompute") {
    val emb = Tables.embeddings(spark, sf0001)
    val topk = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))

    // recompute on the driver from raw vectors
    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val q = vecs.find(_._1 == 0L).get._2
    def cos(a: Array[Double], b: Array[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val expected = vecs.filter(_._1 != 0L)
      .map { case (id, v) =>
        (id, BigDecimal(cos(q, v)).setScale(4,
          BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, s) => (-s, id) }.take(5)
    assert(topk.toSeq == expected.toSeq)
  }

  test("nearDupPairsLsh returns a subset of exact pairs (perfect precision)") {
    val emb = Tables.embeddings(spark, sf0001)
    val exact = Similarity.nearDupPairs(emb, 0.4)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupPairsLsh(emb, 0.4)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "exact verify must kill false positives")
    info(s"recall at t=0.4: ${lsh.size}/${exact.size}")
  }

  test("ivfTopK fills top-k and overlaps brute force on probed cells") {
    val emb = Tables.embeddings(spark, sf0001)
    val res = Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb, 10)
    val byQuery = res.groupBy("query_id").count().collect()
      .map(r => r.getLong(1))
    assert(byQuery.length == 3 && byQuery.forall(_ == 10L))
    // sims within each query are non-increasing by rank
    val rows = res.orderBy("query_id", "rank").collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Double]("sim")))
    rows.grouped(10).foreach { g =>
      assert(g.map(_._2).sliding(2).forall(p =>
        p.length < 2 || p(0) >= p(1)))
    }
  }

  test("ivfTopK with Lloyd refinement keeps the contract and can only help") {
    val emb = Tables.embeddings(spark, sf0001)
    val refined = Similarity.ivfTopK(emb.filter(col("vec_id") < 3), emb,
      10, refineIters = 2)
    val byQuery = refined.groupBy("query_id").count().collect()
      .map(r => r.getLong(1))
    assert(byQuery.length == 3 && byQuery.forall(_ == 10L))
    // refined cells must still partition the corpus: every corpus
    // vector lands in exactly one cell, so probing all cells == brute
    // force; with nProbe = numCells the result matches brute force
    val full = Similarity.ivfTopK(emb.filter(col("vec_id") === 0), emb,
      5, numCells = 4, nProbe = 4, refineIters = 1)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
    val brute = Similarity.bruteForceTopK(
      emb.filter(col("vec_id") === 0), emb, 5)
      .orderBy("rank").collect()
      .map(r => (r.getAs[Long]("neighbor_id"), r.getAs[Double]("sim")))
    assert(full.toSeq == brute.toSeq,
      "probing every cell must equal brute force")
  }

  test("lshTopK returns exact-ranked subset with full k rows per query") {
    val emb = Tables.embeddings(spark, sf0001)
    val res = Similarity.lshTopK(emb.filter(col("vec_id") < 3), emb, 10)
    val byQuery = res.groupBy("query_id").count().collect()
      .map(r => r.getLong(1))
    assert(byQuery.forall(_ == 10L), "each query should fill its top-10")
  }
}
