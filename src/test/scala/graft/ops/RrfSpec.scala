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
}
