package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.PipelineConfig

/** Watermarked tumbling windows in append mode: windows finalize once
  * the watermark passes their end; too-late events are dropped (the
  * bounded-lateness contrast to the SummingStore's unbounded design).
  */
class WindowedRollupSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("warehouse"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  private def queueLine(ts: Long, level: String) =
    s"""{"timestamp": $ts, "level": "$level", "message": "m"}"""

  test("windows finalize on watermark passage; too-late events drop") {
    val c = cfg()
    val h0 = 1767261600L // 2026-01-01 10:00:00 UTC, hour-aligned
    // hour A gets 2 info + 1 error; hour B (next hour) 1 info
    writeTopicFile(c, "b0.json", Seq(
      queueLine(h0 + 60, "info"), queueLine(h0 + 120, "info"),
      queueLine(h0 + 300, "error"), queueLine(h0 + 3700, "info")))
    WindowedRollup.start(spark, c).awaitTermination()
    // nothing finalized yet: watermark = max(ts) - 10 min is inside
    // hour B, so both windows are still open
    assert(WindowedRollup.hourlyFinal(spark, c).count() == 0)

    // a STILL-IN-WINDOW straggler merges: watermark after b0 is
    // h0+3100, inside hour A's window (ends h0+3600), so a late row
    // for hour A is accepted — lateness is judged by window end, not
    // by row timestamp
    writeTopicFile(c, "b1.json", Seq(queueLine(h0 + 400, "info")))
    WindowedRollup.start(spark, c).awaitTermination()
    assert(WindowedRollup.hourlyFinal(spark, c).count() == 0)

    // an event two days on closes both windows, finalized counts
    // include the merged straggler
    writeTopicFile(c, "b2.json", Seq(queueLine(h0 + 2 * 86400, "warn")))
    WindowedRollup.start(spark, c).awaitTermination()
    val rows = WindowedRollup.hourlyFinal(spark, c)
      .orderBy("hour_start_us", "level").collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    assert(rows.toSeq == Seq(
      (h0 * 1000000L, "error", 1L),
      (h0 * 1000000L, "info", 3L),
      ((h0 + 3600) * 1000000L, "info", 1L)))

    // a TOO-LATE straggler (window already finalized and evicted)
    // is dropped — no fourth row, no double count
    writeTopicFile(c, "b3.json", Seq(queueLine(h0 + 500, "info")))
    WindowedRollup.start(spark, c).awaitTermination()
    assert(WindowedRollup.hourlyFinal(spark, c).count() == 3)

    // replay: no duplicate windows
    WindowedRollup.start(spark, c).awaitTermination()
    assert(WindowedRollup.hourlyFinal(spark, c).count() == 3)
  }
}
