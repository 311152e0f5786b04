package graft.ops

import graft.SparkSpec

class RrfSpec extends SparkSpec {
  import spark.implicits._

  test("hand case: overlap doc wins, singles ordered by rank, ties to " +
      "lowest id") {
    val a = Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("doc_id", "rank")
    val b = Seq((12L, 1L), (13L, 2L)).toDF("doc_id", "rank")
    val got = Rrf.fuse(Seq(a, b), 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = Seq(
      (12L, r6(1.0 / 63 + 1.0 / 61), 1L), // in both lists
      (10L, r6(1.0 / 61), 2L),
      (11L, r6(1.0 / 62), 3L), // ties 13 on score; lower id ranks first
      (13L, r6(1.0 / 62), 4L))
    assert(got.sortBy(_._3).toSeq == expected.sortBy(_._3))
  }

  test("k bounds the output; single list is identity ordering") {
    val a = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("doc_id", "rank")
    val got = Rrf.fuse(Seq(a), 2).collect().map(_.getLong(0)).toSeq
    assert(got.sorted == Seq(1L, 2L))
  }

  test("fuseBatch equals per-query fuse exactly (same sums, rounding, " +
      "tie order), and queries never bleed into each other") {
    // two queries with overlapping doc ids and deliberately different
    // per-query list shapes
    val lexB = Seq(
      ("q1", 10L, 1L), ("q1", 11L, 2L), ("q1", 12L, 3L),
      ("q2", 12L, 1L), ("q2", 10L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val denseB = Seq(
      ("q1", 12L, 1L), ("q1", 13L, 2L),
      ("q2", 14L, 1L), ("q2", 12L, 2L))
      .toDF("query_id", "doc_id", "rank")
    val batch = Rrf.fuseBatch(Seq(lexB, denseB), 3).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    for (q <- Seq("q1", "q2")) {
      val single = Rrf.fuse(Seq(
          lexB.filter($"query_id" === q).select("doc_id", "rank"),
          denseB.filter($"query_id" === q).select("doc_id", "rank")), 3)
        .collect()
        .map(r => (q, r.getLong(0)) -> (r.getDouble(1), r.getLong(2)))
        .toMap
      assert(batch.view.filterKeys(_._1 == q).toMap == single,
        s"batch fusion for $q diverges from per-query fuse")
    }
  }

  test("fuseBatch plan: per-query window partitioned on query_id — " +
      "no global (empty-partition) window") {
    val lexB = Seq(("q1", 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val plan = Rrf.fuseBatch(Seq(lexB), 5)
      .queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.nonEmpty)
    windows.foreach(w => assert(w.partitionSpec.nonEmpty,
      "batch fusion must never plan a global window"))
  }
}
