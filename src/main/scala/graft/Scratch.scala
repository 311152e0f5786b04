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
    // drive streaming dedup through the public pipeline API
    val root = java.nio.file.Files.createTempDirectory("drive").toString
    val cfg = graft.config.PipelineConfig(topicsRoot = s"$root/topics",
      warehouseRoot = s"$root/wh")
    val dir = java.nio.file.Paths.get(cfg.topicDir("event_tracking"))
    java.nio.file.Files.createDirectories(dir)
    def ev(ct: String, t: String) =
      s"""{"campaign_id": "$ct", "workspace_id": "w", "email": "u@x",""" +
      s""" "event_type": "open", "event_time": "$t", "metadata": null}"""
    java.nio.file.Files.write(dir.resolve("b0.json"),
      (ev("c1", "2026-08-12T10:00:00") + "\n" +
       ev("c1", "2026-08-12T10:00:00") + "\n" +
       ev("c2", "2026-08-12T11:00:00")).getBytes)
    graft.pipeline.DirectPipeline.start(spark, cfg,
      dedupKeys = Seq("campaign_id", "event_time", "email"))
      .awaitTermination()
    println("after b0: rows=" +
      graft.pipeline.DirectPipeline.emailEvents(spark, cfg).count())
    java.nio.file.Files.write(dir.resolve("b1.json"),
      (ev("c1", "2026-08-12T10:00:00") + "\n" +
       ev("c3", "2026-08-12T12:00:00")).getBytes)
    graft.pipeline.DirectPipeline.start(spark, cfg,
      dedupKeys = Seq("campaign_id", "event_time", "email"))
      .awaitTermination()
    println("after b1 (retry of c1 + new c3): rows=" +
      graft.pipeline.DirectPipeline.emailEvents(spark, cfg).count())
    // probe: dedup disabled -> duplicates flow (reference at-least-once)
    val cfg2 = graft.config.PipelineConfig(topicsRoot = s"$root/topics",
      warehouseRoot = s"$root/wh2")
    graft.pipeline.DirectPipeline.start(spark, cfg2).awaitTermination()
    println("no-dedup: rows=" +
      graft.pipeline.DirectPipeline.emailEvents(spark, cfg2).count())
    // drive bucketing through public API
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_quantity")
    graft.scale.Bucketing.writeBucketed(li, "drive_bkt", "l_orderkey", 4)
    val j = graft.scale.Bucketing.bucketedJoin(spark, "drive_bkt",
      "drive_bkt", "l_orderkey")
    println("bucketed self-join exchange-free=" +
      graft.scale.Bucketing.isExchangeFree(j) + " rows=" + j.count())
    spark.stop()
  }
}
