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

  test("first-attempt levels match the batch Funnel operator on random input") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val c = cfg()
    // 40 users x 6 events with seeded-random types/times in a 2 h span;
    // 1 h funnel window so levels spread. The far-future sentinel
    // advances the watermark past every deadline so ALL attempts close.
    val rnd = new scala.util.Random(7)
    val types = Vector("delivered", "open", "click", "bounce")
    val evs = for { u <- 0 until 40; _ <- 0 until 6 } yield {
      val t = rnd.nextInt(7200)
      (f"u$u%02d", types(rnd.nextInt(types.size)),
        f"2026-01-01T${10 + t / 3600}%02d:${(t / 60) % 60}%02d:${t % 60}%02d")
    }
    writeTopicFile(c, "b0.json",
      evs.map { case (u, ty, t) => wire(u, ty, t) } :+
        wire("zz", "delivered", "2026-02-01T00:00:00"))
    run(c)
    // streaming: level of each user's FIRST attempt (min anchor);
    // users that never anchored have no row -> level 0
    val streamed = collected(c).filter(_._1 != "zz")
      .groupBy(_._1).map { case (u, rows) =>
        u -> rows.minBy(_._2)._3
      }
    // batch operator over the same tuples (ms timestamps, 1 h window)
    val batchDf = evs.toSeq.toDF("u", "typ", "t")
      .select(col("u"), col("typ"),
        (org.apache.spark.sql.functions.unix_micros(
          col("t").cast("timestamp")) / 1000).cast("long").as("ms"))
    val batch = graft.ops.Funnel.userLevels(batchDf, col("u"), col("ms"),
        Seq(col("typ") === lit("delivered"), col("typ") === lit("open"),
          col("typ") === lit("click")), windowUs = 3600L * 1000L)
      .as[(String, Int)].collect().toMap
    batch.foreach { case (u, lvl) =>
      assert(streamed.getOrElse(u, 0) == lvl,
        s"user $u: streaming ${streamed.getOrElse(u, 0)} != batch $lvl")
    }
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
