package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docsX = Tables.documents(spark, d)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    // drive the Retrieval API end-to-end via public exports
    val root = java.nio.file.Files.createTempDirectory("ret").toString
    val cfg = graft.config.PipelineConfig(topicsRoot = s"$root/t",
      warehouseRoot = s"$root/w")
    val dir = java.nio.file.Paths.get(cfg.topicDir("event_tracking"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("b.json"),
      ("""{"campaign_id": "c9", "workspace_id": "w", "email": "u@x", "event_type": "open", "event_time": "2026-08-12T10:00:00", "metadata": null}""" + "\n" +
       """{"campaign_id": "c9", "workspace_id": "w", "email": "u@x", "event_type": "bounce", "event_time": "2026-08-12T11:00:00", "metadata": null}""").getBytes)
    graft.pipeline.DirectPipeline.start(spark, cfg).awaitTermination()
    val opened = graft.query.Retrieval.openedEmails(spark, cfg, "c9")
    println("openedEmails rows=" + opened.count())
    println("eventsForDay(20260812)=" +
      graft.query.Retrieval.eventsForDay(spark, cfg, 20260812).count())
    println("eventsForDay(20260813)=" +
      graft.query.Retrieval.eventsForDay(spark, cfg, 20260813).count())
    spark.stop()
  }
}
