package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.PipelineConfig

/** Streaming funnel: in-stream completion, watermark-timeout expiry of
  * stalled attempts, re-anchoring after completion, replay idempotence.
  * Same AvailableNow-per-batch driving discipline as
  * [[SessionPipelineSpec]] (checkpointed state between runs; each run's
  * trailing no-data micro-batch evaluates event-time timeouts).
  */
class FunnelPipelineSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("warehouse"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  // 1h funnel window so in-test timestamps stay readable
  private def run(c: PipelineConfig): Unit =
    FunnelPipeline.start(spark, c, windowMs = 3600L * 1000L,
      lateness = "5 minutes").awaitTermination()

  private def wire(email: String, typ: String, t: String) =
    s"""{"campaign_id": "c1", "workspace_id": "w", "email": "$email",""" +
      s""" "event_type": "$typ", "event_time": "$t", "metadata": {}}"""

  private def ms(t: String) = java.sql.Timestamp.valueOf(t).getTime

  private def collected(c: PipelineConfig) =
    FunnelPipeline.results(spark, c)
      .orderBy("email", "anchor_ms").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getBoolean(3), r.getLong(4))).toSeq

  test("completions emit in-stream; stalled attempts expire by timeout") {
    val c = cfg()
    // u1 completes delivered->open->click inside the hour (emitted in
    // this run). u2 stops at open; u3's open is OUTSIDE the 1h window
    // (level stays 1). The far-future u4 event advances the watermark
    // past u2/u3's deadlines so the trailing no-data batch expires both.
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "delivered", "2026-01-01T10:00:00"),
      wire("u1", "open", "2026-01-01T10:05:00"),
      wire("u1", "click", "2026-01-01T10:10:00"),
      wire("u2", "delivered", "2026-01-01T10:00:00"),
      wire("u2", "open", "2026-01-01T10:20:00"),
      wire("u3", "delivered", "2026-01-01T10:00:00"),
      wire("u3", "open", "2026-01-01T11:30:00"),
      wire("u4", "delivered", "2026-01-01T13:00:00")))
    run(c)
    // u4's own attempt (deadline 14:00) is still open in state
    assert(collected(c) == Seq(
      ("u1", ms("2026-01-01 10:00:00"), 3, true, ms("2026-01-01 10:10:00")),
      ("u2", ms("2026-01-01 10:00:00"), 2, false, -1L),
      ("u3", ms("2026-01-01 10:00:00"), 1, false, -1L)))

    // next batch: u1 re-anchors (fresh attempt after completion) but
    // stalls at level 1; far-future u5 expires it AND u4's open attempt
    writeTopicFile(c, "b1.json", Seq(
      wire("u1", "delivered", "2026-01-01T15:00:00"),
      wire("u5", "delivered", "2026-01-01T20:00:00")))
    run(c)
    val afterB1 = collected(c)
    assert(afterB1.contains(
      ("u1", ms("2026-01-01 15:00:00"), 1, false, -1L)))
    assert(afterB1.contains(
      ("u4", ms("2026-01-01 13:00:00"), 1, false, -1L)))

    // replay with the same checkpoint and no new data: no duplicates
    val before = afterB1.size
    run(c)
    assert(FunnelPipeline.results(spark, c).count() == before)
  }

  test("strict order within the window: out-of-order batch still exact") {
    val c = cfg()
    // intra-batch disorder: click arrives first in the file but
    // folding sorts by event time, so the chain still completes
    writeTopicFile(c, "b0.json", Seq(
      wire("u1", "click", "2026-01-01T10:10:00"),
      wire("u1", "delivered", "2026-01-01T10:00:00"),
      wire("u1", "open", "2026-01-01T10:05:00"),
      // u2: click BEFORE open by event time -> stalls at open level 2
      wire("u2", "delivered", "2026-01-01T10:00:00"),
      wire("u2", "click", "2026-01-01T10:02:00"),
      wire("u2", "open", "2026-01-01T10:04:00"),
      wire("zz", "delivered", "2026-01-02T10:00:00")))
    run(c)
    val got = collected(c)
    assert(got.contains(
      ("u1", ms("2026-01-01 10:00:00"), 3, true, ms("2026-01-01 10:10:00"))))
    // u2's click at 10:02 can't be taken at level 2 (needs open first);
    // open at 10:04 advances to 2; no later click -> expires at 2
    assert(got.contains(("u2", ms("2026-01-01 10:00:00"), 2, false, -1L)))
  }
}
