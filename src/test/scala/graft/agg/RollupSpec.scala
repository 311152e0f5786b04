package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Reference-fidelity tests for the MV query + SummingMergeTree contract
  * (kafka+clickhouse.md:221-229, 396-401, 240-243): partial aggregation
  * over arbitrary batch splits, re-summed, must equal the direct
  * aggregation over all raw events — including late arrivals.
  */
class RollupSpec extends SparkSpec {
  import spark.implicits._

  private def queue(rows: (Long, String, String)*) =
    rows.toDF("timestamp", "level", "message")

  test("fromQueue groups by epoch-seconds day and level") {
    val day0 = 1700000000L // 2023-11-14 22:13:20 UTC
    val df = DailyRollup.fromQueue(queue(
      (day0, "info", "a"), (day0 + 60, "info", "b"),
      (day0, "error", "c"),
      (day0 + 86400, "info", "d")))
    val got = df.orderBy("day", "level").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      ("2023-11-14", "error", 1L), ("2023-11-14", "info", 2L),
      ("2023-11-15", "info", 1L)))
  }

  test("split-into-batches + re-sum == direct aggregation (SummingMergeTree contract)") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((1700000000L + rnd.nextInt(400000).toLong,
      Seq("info", "warn", "error")(rnd.nextInt(3)), "m"))
    val all = queue(rows: _*)
    val direct = DailyRollup.levelTotals(DailyRollup.fromQueue(all))
      .orderBy("level").collect().map(r => (r.getString(0), r.getLong(1)))

    // three different split shapes, incl. a "late data" final batch
    // whose days precede earlier batches' (unbounded lateness, H4)
    for (splits <- Seq(Seq(100, 400), Seq(499, 1), Seq(50, 50, 400))) {
      val batches = splits.scanLeft(0)(_ + _).sliding(2).map {
        case Seq(a, b) => queue(rows.slice(a, b): _*)
      }.toSeq
      val partials = batches.map(DailyRollup.fromQueue).reduce(_ union _)
      val merged = DailyRollup.levelTotals(partials)
        .orderBy("level").collect().map(r => (r.getString(0), r.getLong(1)))
      assert(merged.toSeq == direct.toSeq, s"splits=$splits")
    }
  }
}
