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
    val docs = Tables.documents(spark, d)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("dl").toString
    val cfg = graft.config.PipelineConfig(topicsRoot = s"$root/t",
      warehouseRoot = s"$root/w")
    val dir = java.nio.file.Paths.get(cfg.topicDir("event_tracking"))
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("b0.json"),
      ("""{"campaign_id": "c1", "workspace_id": "w", "email": "a@x", "event_type": "open", "event_time": "2026-08-12T10:00:00", "metadata": null}""" + "\n" +
       """{"campaign_id": "c2", "workspace_id": "w", "email": "b@x", "event_type": "NOT_AN_ENUM", "event_time": "2026-08-12T10:00:01", "metadata": null}""" + "\n" +
       """garbage {{{ not json""").getBytes)
    graft.pipeline.DirectPipeline.start(spark, cfg).awaitTermination()
    println("email_events rows=" +
      graft.pipeline.DirectPipeline.emailEvents(spark, cfg).count())
    val dead = spark.read.text(cfg.tablePath("dead_letter"))
    println("dead_letter rows=" + dead.count())
    dead.collect().foreach(r => println("DEAD: " +
      r.getString(0).take(80)))
    spark.stop()
  }
}
