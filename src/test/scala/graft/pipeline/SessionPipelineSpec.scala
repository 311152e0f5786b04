package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.PipelineConfig

/** Streaming sessionization: closed sessions, watermark-timeout
  * closure, gap merging across restarts, replay idempotence.
  *
  * Each batch is driven by its own AvailableNow run (state + watermark
  * recovered from the checkpoint between runs), making batch order
  * deterministic — files written within the same mtime tick are not
  * ordered by the file source. Each run ends with a no-data micro-batch
  * that evaluates event-time timeouts against the freshly-advanced
  * watermark, so a timeout whose deadline the run's own data passed
  * fires within that run.
  */
class SessionPipelineSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("warehouse"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  private def run(c: PipelineConfig): Unit =
    SessionPipeline.start(spark, c, gapSec = 1800L,
      lateness = "5 minutes").awaitTermination()

  private def wire(email: String, t: String) =
    s"""{"campaign_id": "c1", "workspace_id": "w", "email": "$email",""" +
      s""" "event_type": "open", "event_time": "$t", "metadata": {}}"""

  private def ms(t: String) = java.sql.Timestamp.valueOf(t).getTime

  test("gap sessions close on newer events and on watermark timeout") {
    val c = cfg()
    // batch 1: u1 has two bursts 31 min apart — the second burst closes
    // the first session in-stream. The run's trailing no-data batch
    // then advances the watermark to 10:41 - 5 min = 10:36, past u2's
    // deadline (10:05 + 30 min gap = 10:35) -> u2 times out too; u1's
    // second burst (deadline 11:11) stays open in state.
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "2026-01-01T10:00:00"),
      wire("u1", "2026-01-01T10:10:00"),
      wire("u1", "2026-01-01T10:41:00"),
      wire("u2", "2026-01-01T10:05:00")))
    run(c)
    val afterB0 = SessionPipeline.closedSessions(spark, c)
      .orderBy("email", "start_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(afterB0.toSeq == Seq(
      ("u1", ms("2026-01-01 10:00:00"), ms("2026-01-01 10:10:00"), 2L),
      ("u2", ms("2026-01-01 10:05:00"), ms("2026-01-01 10:05:00"), 1L)))

    // batch 2 (state + watermark recovered from the checkpoint): a
    // far-future event moves the watermark to 01-02 08:55 -> u1's
    // second burst times out; u3 (deadline 01-02 09:30) stays open.
    writeTopicFile(c, "b1.json",
      Seq(wire("u3", "2026-01-02T09:00:00")))
    run(c)
    val closed = SessionPipeline.closedSessions(spark, c)
      .orderBy("email", "start_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(closed.toSeq == Seq(
      ("u1", ms("2026-01-01 10:00:00"), ms("2026-01-01 10:10:00"), 2L),
      ("u1", ms("2026-01-01 10:41:00"), ms("2026-01-01 10:41:00"), 1L),
      ("u2", ms("2026-01-01 10:05:00"), ms("2026-01-01 10:05:00"), 1L)))

    // replay with the same checkpoint and no new data: no duplicates
    run(c)
    assert(SessionPipeline.closedSessions(spark, c).count() == 3)

    // one more far-future batch closes u3
    writeTopicFile(c, "b2.json",
      Seq(wire("u4", "2026-01-03T00:00:00")))
    run(c)
    val u3 = SessionPipeline.closedSessions(spark, c)
      .filter(org.apache.spark.sql.functions.col("email") === "u3")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(u3.toSeq == Seq(
      (ms("2026-01-02 09:00:00"), ms("2026-01-02 09:00:00"), 1L)))
  }

  test("in-batch disorder is sorted; cross-batch within-gap events merge") {
    val c = cfg()
    // disorder inside one file: later event listed first
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "2026-01-01T10:20:00"),
      wire("u1", "2026-01-01T10:00:00")))
    run(c)
    // next batch continues the same session (10:45 - 10:20 < 30 min)
    writeTopicFile(c, "b1.json", Seq(
      wire("u1", "2026-01-01T10:45:00")))
    run(c)
    // two flush batches: the first advances the watermark past u1's
    // deadline, the second fires the timeout
    writeTopicFile(c, "b2.json", Seq(wire("zz", "2026-01-05T00:00:00")))
    run(c)
    writeTopicFile(c, "b3.json", Seq(wire("zz", "2026-01-06T00:00:00")))
    run(c)
    val out = SessionPipeline.closedSessions(spark, c)
      .filter(org.apache.spark.sql.functions.col("email") === "u1")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (ms("2026-01-01 10:00:00"), ms("2026-01-01 10:45:00"), 3L)))
  }
}
