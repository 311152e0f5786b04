package graft.query

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.config.PipelineConfig
import graft.pipeline.{DirectPipeline, MaterializedPipeline}

class RetrievalSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("wh"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  private def wire(ct: String, et: String, t: String) =
    s"""{"campaign_id": "$ct", "workspace_id": "w", "email": "$ct@x",
       | "event_type": "$et", "event_time": "$t", "metadata": null}"""
      .stripMargin.replaceAll("\n", "")

  private def queueLine(ts: Long, level: String) =
    s"""{"timestamp": $ts, "level": "$level", "message": "m"}"""

  test("retrieval API over the engine's own warehouse") {
    val c = cfg()
    writeTopicFile(c, "b0.json", Seq(
      wire("c1", "open", "2026-08-12T10:00:00"),
      wire("c1", "open", "2026-08-12T11:00:00"),
      wire("c1", "delivered", "2026-08-12T09:00:00"),
      wire("c2", "open", "2026-08-13T10:00:00")))
    DirectPipeline.start(spark, c).awaitTermination()

    val opened = Retrieval.openedEmails(spark, c, "c1").collect()
    assert(opened.length == 2 && opened.forall(_.getString(0) == "c1@x"))
    // DESC ordering
    assert(opened.head.getTimestamp(1).after(opened(1).getTimestamp(1)))

    val day = Retrieval.eventsForDay(spark, c, 20260813)
    assert(day.count() == 1)
    // partition pruning visible in the plan
    assert(day.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(event_date"))
  }

  test("continuously-running MV (ProcessingTime trigger) + consistency") {
    val c = cfg()
    // same semantic stream into both routes: wire shape for Part 1,
    // queue shape for Part 2, equal level counts
    writeTopicFile(c, "w0.json", Seq(
      wire("c1", "open", "2026-08-12T10:00:00"),
      wire("c2", "delivered", "2026-08-12T10:00:01")))
    DirectPipeline.start(spark, c).awaitTermination()

    val qcfg = PipelineConfig(topicsRoot = c.topicsRoot,
      topics = Map("event_tracking" -> "queue.topic"),
      warehouseRoot = c.warehouseRoot)
    val qdir = Paths.get(qcfg.topicDir("event_tracking"))
    Files.createDirectories(qdir)
    Files.write(qdir.resolve("q0.json"),
      (queueLine(1765533600L, "open") + "\n" +
        queueLine(1765533601L, "delivered")).getBytes)

    // a genuinely continuous trigger: start, let it drain, add a file
    // mid-flight, wait for it to be absorbed WITHOUT a restart
    val q = MaterializedPipeline.start(spark, qcfg,
      trigger = Trigger.ProcessingTime(200))
    try {
      q.processAllAvailable()
      Files.write(qdir.resolve("q1.json"),
        queueLine(1765533700L, "open").getBytes)
      q.processAllAvailable()
    } finally q.stop()

    val totals = Retrieval.levelTotals(spark, qcfg).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(totals == Map("open" -> 2L, "delivered" -> 1L))

    // consistencyDiff: raw has open=1,delivered=1; agg has open=2 ->
    // exactly one divergent level reported
    val diff = Retrieval.consistencyDiff(spark, qcfg)
    assert(diff.count() == 1)
    // after matching the raw side, diff is empty
    writeTopicFile(c, "w1.json",
      Seq(wire("c3", "open", "2026-08-12T12:00:00")))
    DirectPipeline.start(spark, c).awaitTermination()
    assert(Retrieval.consistencyDiff(spark, qcfg).isEmpty)
  }
}
