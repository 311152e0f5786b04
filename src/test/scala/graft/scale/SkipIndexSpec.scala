package graft.scale

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SkipIndexSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf0001)

  private lazy val layout: String = {
    val p = tmpDir("skipindex") + "/events_bloom"
    SkipIndex.ensureEventsBloom(events, p)
    p
  }

  test("bloom skip index prunes a non-sort point probe that minmax cannot") {
    // a key that exists (the registered query's probe key)
    val hit = SkipIndex.candidateRowGroups(spark, layout, "event_id", 777L)
    info(s"present key: $hit")
    assert(hit.totalRowGroups >= 4,
      s"granularity too coarse to observe skipping: $hit")
    assert(hit.bloomsPresent == hit.totalRowGroups,
      s"bloom missing on some row groups (dictionary fallback?): $hit")
    // the layout is sorted by user_id, event_id is scattered: minmax
    // granule stats retain (nearly) everything...
    assert(hit.minmaxCandidates >= hit.totalRowGroups / 2,
      s"minmax unexpectedly prunes a scattered column: $hit")
    // ...while the bloom collapses the probe to the containing
    // group(s) plus at most a false positive or two
    assert(hit.bloomCandidates >= 1 && hit.bloomCandidates <= 3,
      s"bloom should isolate the containing row group: $hit")
    assert(hit.bloomCandidates < hit.minmaxCandidates,
      s"bloom must out-prune minmax on a non-sort column: $hit")

    // an absent key: blooms reject everywhere (no false negatives
    // exist by construction, so 0 candidates is pure pruning; the
    // filter is deterministic, so this is not a flaky bound)
    val miss = SkipIndex.candidateRowGroups(spark, layout, "event_id",
      -42L)
    info(s"absent key: $miss")
    assert(miss.bloomCandidates <= 1,
      s"absent key should be rejected by (almost) every bloom: $miss")
  }

  test("bloom-indexed layout answers the probe exactly like the base table") {
    val viaIndex = spark.read.parquet(layout)
      .filter(col("event_id") === lit(777))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().toSeq
    val direct = events
      .filter(col("event_id") === lit(777))
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .collect().toSeq
    assert(direct.nonEmpty)
    assert(viaIndex == direct)
  }

  test("production email_events layout carries the email bloom (GDPR point probe)") {
    import spark.implicits._
    val cfg = graft.config.PipelineConfig(
      topicsRoot = tmpDir("topics"), warehouseRoot = tmpDir("wh"))
    val rows = (1 to 4000).map(i => ("c" + (i % 7), "w",
        s"user$i@mail.example", "open",
        java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "",
        20240101))
      .toDF("campaign_id", "workspace_id", "email", "event_type",
        "event_time", "metadata", "event_date")
    graft.ingest.EventSink.writeEmailEvents(rows, cfg)
    val part = cfg.tablePath("email_events") + "/event_date=20240101"
    // bloom present on every row group despite a repeated-value-free
    // high-NDV column (dictionary disabled on email by the writer)
    val hit = SkipIndex.candidateRowGroups(spark, part, "email",
      "user123@mail.example")
    info(s"present email: $hit")
    assert(hit.totalRowGroups >= 1 &&
      hit.bloomsPresent == hit.totalRowGroups)
    assert(hit.bloomCandidates >= 1 &&
      hit.minmaxCandidates == hit.totalRowGroups)
    // an absent subject INSIDE the column's lexicographic range:
    // string min/max stats cannot prune it, the bloom rejects it
    // (deterministic for fixed data) — an erasure/access probe for a
    // never-seen address opens zero row groups
    val miss = SkipIndex.candidateRowGroups(spark, part, "email",
      "user2500x@mail.example")
    info(s"absent email: $miss")
    assert(miss.minmaxCandidates == miss.totalRowGroups,
      s"in-range probe should pass minmax: $miss")
    assert(miss.bloomCandidates == 0)
    // out-of-range absent subject: even the string MINMAX path prunes
    val below = SkipIndex.candidateRowGroups(spark, part, "email",
      "ghost@mail.example")
    assert(below.minmaxCandidates == 0 && below.bloomCandidates == 0)
  }

  test("ensure is idempotent and a torn marker forces a rebuild") {
    val fs = Hdfs.of(spark, layout)
    val marker = new org.apache.hadoop.fs.Path(s"$layout/_graft_meta")
    val t0 = fs.getFileStatus(marker).getModificationTime
    SkipIndex.ensureEventsBloom(events, layout) // current → no-op
    assert(fs.getFileStatus(marker).getModificationTime == t0)
    val out = fs.create(marker, true) // torn marker
    try out.write("rows=12".getBytes("UTF-8")) finally out.close()
    SkipIndex.ensureEventsBloom(events, layout) // stale → rebuild
    val in = fs.open(marker)
    val s = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    // the stamp carries the data fingerprint AND the layout params —
    // a parameter retune must invalidate, not serve the old layout
    assert(s == s"rows=${events.count()};sort=user_id;" +
      "bloom=event_id;ndv=4096;rg=65536")
  }
}
