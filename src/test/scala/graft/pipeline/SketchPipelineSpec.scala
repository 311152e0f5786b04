package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.config.PipelineConfig

/** End-to-end gates for the streaming sketch-state MV: all three
  * stores (HLL distinct / GK quantiles / CMS frequencies) maintained
  * by one query over the JSON-lines topic stand-in, cross-batch
  * answers correct against hand truth, restart-without-reprocessing,
  * and rollup-from-states on the frequency store.
  */
class SketchPipelineSpec extends SparkSpec {

  private def cfg(): PipelineConfig =
    PipelineConfig(topicsRoot = tmpDir("topics"),
      warehouseRoot = tmpDir("warehouse"))

  private def writeTopicFile(c: PipelineConfig, name: String,
      lines: Seq[String]): Unit = {
    val dir = Paths.get(c.topicDir("event_tracking"))
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), lines.mkString("\n").getBytes)
  }

  private def line(ts: Long, level: String, msg: String) =
    s"""{"timestamp": $ts, "level": "$level", "message": "$msg"}"""

  test("sketch MV: distinct/quantile/frequency states across batches") {
    val c = cfg()
    val day0 = 1700000000L
    // batch 0: info has messages a,a,bb — 2 distinct; error has ccc
    writeTopicFile(c, "b0.json", Seq(
      line(day0, "info", "a"), line(day0 + 1, "info", "a"),
      line(day0 + 2, "info", "bb"), line(day0 + 3, "error", "ccc")))
    SketchPipeline.start(spark, c).awaitTermination()

    val d1 = SketchPipeline.distinctMessages(spark, c).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(d1("info") == 2L && d1("error") == 1L)

    // batch 1: new distinct message for info, another 'a' (no change)
    writeTopicFile(c, "b1.json", Seq(
      line(day0 + 4, "info", "dddd"), line(day0 + 5, "info", "a")))
    SketchPipeline.start(spark, c).awaitTermination()

    val d2 = SketchPipeline.distinctMessages(spark, c).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(d2("info") == 3L, "states must union across batches")

    // quantiles from states: info lengths 1,1,2,4,1 -> p50 = 1
    val p50 = SketchPipeline.lengthP50(spark, c).collect()
      .map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(p50("info") == 1.0 && p50("error") == 3.0)

    // frequency rollup across days FROM STATES: 'a' seen 3x in info
    val freqs = SketchPipeline
      .levelMessageFreq(spark, c, Seq("a", "zzz")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(freqs("info")._1 == 3L && freqs("info")._2 == 0L)
    assert(freqs("error")._1 == 0L)

    // restart with the same checkpoint: nothing reprocessed, answers
    // unchanged (batchId-keyed appends + offset checkpoint)
    SketchPipeline.start(spark, c).awaitTermination()
    val d3 = SketchPipeline.distinctMessages(spark, c).collect()
      .map(r => (r.getString(1), r.getLong(2))).toMap
    assert(d3 == d2)
    val f3 = SketchPipeline
      .levelMessageFreq(spark, c, Seq("a", "zzz")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(f3 == freqs)
  }
}
