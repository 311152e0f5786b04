package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.config.PipelineConfig
import graft.ingest.EventSink

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed join plans with zero shuffle exchanges") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_quantity")
    val ord = Tables.orders(spark, sf0001)
      .select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    Seq("li_bkt", "ord_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a table dir can survive from a previous JVM whose catalog is
      // gone; saveAsTable refuses to reuse the location — clear it
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        t)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Bucketing.writeBucketed(li, "li_bkt", "l_orderkey", 4)
    Bucketing.writeBucketed(ord, "ord_bkt", "l_orderkey", 4)

    val joined = Bucketing.bucketedJoin(spark, "li_bkt", "ord_bkt",
      "l_orderkey")
    assert(Bucketing.isExchangeFree(joined),
      s"expected no shuffle:\n${joined.queryExecution.executedPlan}")

    // and it computes the same rows as the plain (shuffling) join
    val plain = li.join(ord, Seq("l_orderkey")).count()
    assert(joined.count() == plain)

    // aggregation on the bucket key is exchange-free too
    val agg = spark.table("li_bkt").groupBy("l_orderkey")
      .agg(sum("l_quantity"))
    assert(Bucketing.isExchangeFree(agg))
  }

  test("salted join equals plain join") {
    val events = Tables.events(spark, sf0001)
    // user dim joined on a deliberately skew-prone key
    val dim = events.select(col("user_id")).distinct()
      .withColumn("segment", col("user_id") % 3)
    val plain = events.join(dim, Seq("user_id"))
      .groupBy("segment").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = Salting
      .saltedJoin(events, dim, "user_id", discriminator = "event_id")
      .groupBy("segment").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == plain)
  }

  test("salted two-phase count equals direct count") {
    val events = Tables.events(spark, sf0001)
    val direct = events.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val salted = Salting
      .saltedCount(events, "event_type", discriminator = "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == direct)
  }

  test("compaction collapses small files, preserves rows and pruning") {
    val cfg = PipelineConfig(topicsRoot = tmpDir("t"),
      warehouseRoot = tmpDir("w"))
    def batch(day: Int, n: Int) = (0 until n).map(i =>
      (s"c$i", "w1", s"u$i@x", "open", f"2026-08-$day%02dT08:00:$i%02d",
        null)).toDF("campaign_id", "workspace_id", "email", "event_type",
      "event_time", "metadata")
      .withColumn("metadata", lit(null).cast("map<string,string>"))
    // five appends -> many small files across two day partitions
    (0 until 5).foreach { _ =>
      EventSink.writeEmailEvents(EventSink.toEmailEvents(batch(11, 6)),
        cfg)
      EventSink.writeEmailEvents(EventSink.toEmailEvents(batch(12, 6)),
        cfg)
    }
    val path = cfg.tablePath("email_events")
    val before = Maintenance.dataFileCount(spark, path)
    val rowsBefore = spark.read.parquet(path).count()
    Maintenance.compactPartitioned(spark, path, "event_date",
      Seq("campaign_id", "event_time"))
    val after = Maintenance.dataFileCount(spark, path)
    val rowsAfter = spark.read.parquet(path).count()
    assert(rowsAfter == rowsBefore, "compaction must not lose rows")
    assert(after < before, s"file count should drop: $before -> $after")
    assert(after == 2, "one file per day partition at this size")
  }

  test("email_events layout prunes day partitions at scan") {
    val cfg = PipelineConfig(topicsRoot = tmpDir("t"),
      warehouseRoot = tmpDir("w"))
    val wire = Seq(
      ("c1", "w1", "a@x", "open", "2026-08-11T08:00:00", null),
      ("c1", "w1", "b@x", "open", "2026-08-12T09:00:00", null),
      ("c2", "w1", "c@x", "click", "2026-08-13T10:00:00", null)
    ).toDF("campaign_id", "workspace_id", "email", "event_type",
      "event_time", "metadata")
      .withColumn("metadata",
        lit(null).cast("map<string,string>"))
    EventSink.writeEmailEvents(EventSink.toEmailEvents(wire), cfg)

    val read = spark.read.parquet(cfg.tablePath("email_events"))
      .filter(col("event_date") === 20260812)
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_date"),
      s"partition filter not pushed:\n$scan")
    assert(read.count() == 1)
  }

  test("latestByKey keeps the newest row per key with tie-break") {
    val df = Seq(
      (1L, "a", 10L, 100L), (1L, "a", 20L, 101L), // newer version wins
      (1L, "b", 20L, 102L),
      (2L, "a", 30L, 103L), (2L, "a", 30L, 104L)  // version tie -> id
    ).toDF("k1", "k2", "v", "id")
    val got = Maintenance.latestByKey(df,
        Seq(col("k1"), col("k2")), col("v"), col("id"))
      .select("k1", "k2", "id").as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((1L, "a", 101L), (1L, "b", 102L), (2L, "a", 104L)))

    // physical merge: rewrite keeps the same survivors, reads no
    // longer need the window
    val path = tmpDir("replacing") + "/t"
    df.write.mode("overwrite").parquet(path)
    Maintenance.compactReplacing(spark, path, Seq("k1", "k2"), "v", "id")
    val reread = spark.read.parquet(path)
      .select("k1", "k2", "id").as[(Long, String, Long)]
      .collect().toSet
    assert(reread == got)
  }

  test("expireTtl drops whole expired day-parts, never touches live ones") {
    val path = tmpDir("ttl") + "/t"
    Seq(("2024-01-01", 1L), ("2024-01-02", 2L), ("2024-01-10", 3L),
      ("2024-01-11", 4L)).toDF("day", "v")
      .write.partitionBy("day").parquet(path)
    val filesBefore = Maintenance.dataFileCount(spark, path)
    val dropped = Maintenance.expireTtl(spark, path, "day",
      _ < "2024-01-10") // lexicographic cutoff on ISO dates
    assert(dropped == Seq("2024-01-01", "2024-01-02"))
    val left = spark.read.parquet(path).select("day", "v")
      .as[(String, Long)].collect().toSet
    assert(left == Set(("2024-01-10", 3L), ("2024-01-11", 4L)))
    // survivors' files untouched (drop is a directory delete, not a
    // rewrite), and a second pass is a no-op
    assert(Maintenance.dataFileCount(spark, path) < filesBefore)
    assert(Maintenance.expireTtl(spark, path, "day",
      _ < "2024-01-10").isEmpty)
  }
}
