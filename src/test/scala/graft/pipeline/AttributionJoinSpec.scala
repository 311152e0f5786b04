package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.PipelineConfig

/** Stream-stream interval join: in-window matches emit, out-of-window
  * and wrong-key pairs don't, cross-batch matches work (delivery in an
  * earlier micro-batch than the click), replay is idempotent.
  */
class AttributionJoinSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("warehouse"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  private def wire(email: String, tpe: String, t: String) =
    s"""{"campaign_id": "c1", "workspace_id": "w", "email": "$email",""" +
      s""" "event_type": "$tpe", "event_time": "$t", "metadata": {}}"""

  private def ms(t: String) = java.sql.Timestamp.valueOf(t).getTime

  test("clicks join deliveries within the window, across batches") {
    val c = cfg()
    // batch 1: deliveries for u1 and u2; u1 also clicks in-batch
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "delivered", "2026-01-01T10:00:00"),
      wire("u2", "delivered", "2026-01-01T10:05:00"),
      wire("u1", "click", "2026-01-01T10:20:00")))
    // batch 2 (cross-batch): u2 clicks 40 min after delivery (in
    // window); u1 clicks again 75 min after delivery (OUT of the
    // 60-min window); u3 clicks with no delivery at all
    writeTopicFile(c, "b1.json", Seq(
      wire("u2", "click", "2026-01-01T10:45:00"),
      wire("u1", "click", "2026-01-01T11:15:00"),
      wire("u3", "click", "2026-01-01T10:30:00")))
    AttributionJoin.start(spark, c).awaitTermination()

    val got = AttributionJoin.attributions(spark, c)
      .orderBy("email", "click_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == Seq(
      ("u1", ms("2026-01-01 10:00:00"), ms("2026-01-01 10:20:00"),
        20L * 60000),
      ("u2", ms("2026-01-01 10:05:00"), ms("2026-01-01 10:45:00"),
        40L * 60000)))

    // replay with the same checkpoint: no duplicate attributions
    AttributionJoin.start(spark, c).awaitTermination()
    assert(AttributionJoin.attributions(spark, c).count() == 2)
  }

  test("corrupt and schema-less lines are dropped, never crash") {
    val c = cfg()
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "delivered", "2026-01-01T10:00:00"),
      """{"garbage": true}""",
      "not json at all {{{",
      wire("u1", "click", "2026-01-01T10:10:00")))
    AttributionJoin.start(spark, c).awaitTermination()
    assert(AttributionJoin.attributions(spark, c).count() == 1)
  }

  test("a click matching two deliveries in window yields both rows") {
    val c = cfg()
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "delivered", "2026-01-01T10:00:00"),
      wire("u1", "delivered", "2026-01-01T10:30:00"),
      wire("u1", "click", "2026-01-01T10:40:00")))
    AttributionJoin.start(spark, c).awaitTermination()
    val lags = AttributionJoin.attributions(spark, c)
      .orderBy("lag_ms").collect().map(_.getLong(3))
    assert(lags.toSeq == Seq(10L * 60000, 40L * 60000))
  }
}
