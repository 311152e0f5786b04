package graft.agg

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SummingStoreSpec extends SparkSpec {
  import spark.implicits._

  private def store(path: String) =
    new SummingStore(path, Seq("day", "level"), Seq("total"))

  private def partials(rows: (String, String, Long)*) =
    rows.toDF("day", "level", "total")
      .withColumn("day", col("day").cast("date"))

  test("append partials then read re-sums by key") {
    val path = tmpDir("sumstore")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L),
      ("2026-01-01", "error", 1L)), batchId = 0)
    s.append(partials(("2026-01-01", "info", 3L),
      ("2026-01-02", "info", 5L)), batchId = 1)
    val got = s.read(spark).orderBy("day", "level").collect()
      .map(r => (r.getDate(0).toString, r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(("2026-01-01", "error", 1L),
      ("2026-01-01", "info", 5L), ("2026-01-02", "info", 5L)))
  }

  test("batchId rewrite is idempotent (streaming replay safety)") {
    val path = tmpDir("sumstore")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 0)
    // replayed epoch writes the same batch again
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 0)
    val got = s.read(spark).collect().map(r => r.getLong(2))
    assert(got.toSeq == Seq(2L))
  }

  test("compact preserves totals and collapses partial rows") {
    val path = tmpDir("sumstore")
    val s = store(path)
    (0 until 5).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    val before = s.read(spark).collect().map(r => r.getLong(2)).toSeq
    s.compact(spark)
    val after = s.read(spark).collect().map(r => r.getLong(2)).toSeq
    assert(before == Seq(5L) && after == Seq(5L))
    // the published view is ONE compacted block; the absorbed dirs
    // stay on disk one more fold as the in-flight readers' grace
    // window, invisible to reads
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    assert(StoreCompaction.visibleBatchDirs(fs, path)
      .map(_.split('/').last) == Seq("batch=compacted-0"))
    // a second fold retires them: disk holds at most two generations
    s.compact(spark)
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName)
    assert(dirs.toSet == Set("batch=compacted-0", "batch=compacted-1"),
      s"absorbed numeric dirs must be retired by the next fold: " +
        dirs.toSeq.sorted)
    assert(s.read(spark).collect().map(r => r.getLong(2)).toSeq == Seq(5L))
  }

  test("batch-mode append lands in a FRESH dir above every on-disk " +
      "batch id (mid-fold collision regression)") {
    val path = tmpDir("sumstore-fresh")
    val s = store(path)
    // streamed batches 0..5 exist, nothing compacted: watermark is -1,
    // so the old watermark+1 rule appended into batch=0 — a dir a
    // concurrent compact may be mid-fold on (its rows would go
    // invisible at publish and be deleted next fold)
    (0 to 5).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    s.append(partials(("2026-01-01", "info", 10L)))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs.contains("batch=6"),
      s"anonymous append must take max(on-disk id)+1, got: $dirs")
    assert(s.read(spark).collect().map(r => r.getLong(2)).toSeq
      == Seq(16L))
    // and after a compact, the next anonymous append clears both the
    // watermark AND the not-yet-retired generation dirs
    s.compact(spark)
    s.append(partials(("2026-01-01", "info", 100L)))
    assert(s.read(spark).collect().map(r => r.getLong(2)).toSeq
      == Seq(116L))
  }

  test("read racing a compact sees one complete view (reader-safe fold)") {
    val path = tmpDir("sumstore-race")
    val s = store(path)
    (0 until 4).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    // a reader whose file listing resolved BEFORE the fold: the fold
    // must not delete the dirs it scans (deferred retirement)
    val preFold = s.read(spark)
    s.compact(spark)
    assert(preFold.collect().map(_.getLong(2)).toSeq == Seq(4L),
      "pre-fold reader must still see its complete view after compact")
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(4L))
    // a reader created between folds keeps working across the NEXT
    // fold too (its generation is the one under grace)
    s.append(partials(("2026-01-01", "info", 1L)), batchId = 10L)
    val midGen = s.read(spark)
    s.compact(spark)
    assert(midGen.collect().map(_.getLong(2)).toSeq == Seq(5L),
      "between-folds reader must survive the following compact")
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(5L))
  }

  test("readAsOf time-travels the append log; compaction closes it") {
    import spark.implicits._
    val store = new SummingStore(tmpDir("summing-asof") + "/t",
      Seq("level"), Seq("total"))
    store.append(Seq(("click", 3L)).toDF("level", "total"), batchId = 0L)
    store.append(Seq(("click", 4L), ("open", 1L))
      .toDF("level", "total"), batchId = 1L)

    def totals(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals(store.readAsOf(spark, 0L)) == Map("click" -> 3L))
    assert(totals(store.readAsOf(spark, 1L))
      == Map("click" -> 7L, "open" -> 1L))
    // as-of at the head equals the live read
    assert(totals(store.readAsOf(spark, 1L)) == totals(store.read(spark)))

    store.compact(spark)
    assert(totals(store.read(spark))
      == Map("click" -> 7L, "open" -> 1L), "compaction preserves totals")
    intercept[IllegalArgumentException] {
      store.readAsOf(spark, 0L).collect()
    }
  }

  test("compact refuses an int-overflowing fold instead of wrapping") {
    val path = tmpDir("sumstore-overflow")
    val s = new SummingStore(path, Seq("level"), Seq("total"))
    // int-typed sum column; the folded long total exceeds Int.MaxValue,
    // so the downcast back to the raw schema would wrap negative under
    // the default non-ANSI cast — the guard must raise instead
    s.append(Seq(("click", Int.MaxValue)).toDF("level", "total"),
      batchId = 0)
    s.append(Seq(("click", 7)).toDF("level", "total"), batchId = 1)
    val e = intercept[Exception] { s.compact(spark) }
    def causes(t: Throwable): Seq[String] =
      if (t == null) Nil else t.toString +: causes(t.getCause)
    assert(causes(e).exists(_.contains("does not fit")), causes(e))
    // the failed fold must not have corrupted the store
    assert(s.read(spark).collect().map(_.getLong(1)).toSeq
      == Seq(Int.MaxValue.toLong + 7L))
  }

  test("compact is a safe no-op on an empty store") {
    val path = tmpDir("sumstore-empty")
    new java.io.File(path).mkdirs()
    store(path).compact(spark) // must not throw on the schema probe
    assert(new java.io.File(path).listFiles()
      .forall(!_.getName.startsWith("batch=")),
      "no-op compact must not create any batch dir")
  }

  test("compact finishes a fold that crashed before the rename") {
    val path = tmpDir("sumstore-crash")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 0)
    s.append(partials(("2026-01-01", "info", 3L)), batchId = 1)
    // simulate the documented crash state: folded block materialized
    // to tmp, batch dirs deleted, rename never happened. With the
    // marker-first ordering the watermark is already correct.
    s.read(spark).write.parquet(s"$path/_compact_tmp")
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(path, "_compacted_through"), "1")
    new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("batch="))
      .foreach(d => org.apache.commons.io.FileUtils.deleteDirectory(d))
    s.compact(spark) // recovery: rename tmp -> batch=compacted
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(5L))
    intercept[IllegalArgumentException] {
      s.append(partials(("2026-01-01", "info", 9L)), batchId = 1)
    } // watermark survived the crash — folded replay still refused
  }

  test("marker-first crash state stays safe: replay refused, read intact") {
    // the state a compact leaves if it crashes right after the marker
    // write (the ordering foldBatches promises): batch dirs untouched,
    // watermark advanced. A replay must already be refused (refusing a
    // not-yet-folded replay is safe; accepting a folded one is not),
    // and reads still see the un-deleted dirs.
    val path = tmpDir("sumstore-marker")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 1)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(path, "_compacted_through"), "1")
    intercept[IllegalArgumentException] {
      s.append(partials(("2026-01-01", "info", 9L)), batchId = 1)
    }
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(2L))
    // and a re-run compact completes the fold from this state
    s.compact(spark)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(2L))
  }

  test("a crashed fold attempt's orphan generation dir never eats the " +
      "published block (recovery data-loss regression)") {
    val path = tmpDir("sumstore-crash")
    val s = store(path)
    (0 until 3).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    s.compact(spark) // publishes generation 0
    s.append(partials(("2026-01-01", "info", 1L)), batchId = 5L)
    // simulate a fold that crashed AFTER landing batch=compacted-1 but
    // BEFORE flipping the manifest: the orphan dir is invisible junk
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val orphan = new org.apache.hadoop.fs.Path(s"$path/batch=compacted-1")
    partials(("2026-01-01", "info", 99L)).write.parquet(orphan.toString)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(4L),
      "orphan must be invisible before the retry")
    // the retried fold publishes the REAL generation 1 at that name —
    // and must not delete it as stale afterwards
    s.compact(spark)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(4L),
      "retried fold must keep the published totals")
    assert(fs.exists(orphan), "the published generation dir must exist")
  }

  test("the fold's watermark derives from what it folded, not a " +
      "re-listing (append-racing-compact regression)") {
    // Direct protocol-level check: fold with a snapshot that EXCLUDES
    // a batch appended after it; the late batch must stay visible.
    val path = tmpDir("sumstore-latebatch")
    val s = store(path)
    s.append(partials(("2026-01-01", "info", 1L)), batchId = 0L)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val snapshot = StoreCompaction.visibleBatchDirs(fs, path)
    // materialize the fold input from the snapshot
    val tmp = new org.apache.hadoop.fs.Path(s"$path/_compact_tmp")
    spark.read.option("basePath", path).parquet(snapshot: _*)
      .groupBy("day", "level")
      .agg(org.apache.spark.sql.functions.sum("total").as("total"))
      .write.parquet(tmp.toString)
    // a batch lands AFTER the snapshot, BEFORE the fold completes
    s.append(partials(("2026-01-01", "info", 7L)), batchId = 3L)
    StoreCompaction.foldBatches(fs, path, tmp, snapshot)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(8L),
      "the late batch's rows must survive the fold")
  }

  test("a keyed append refuses to clobber an anonymously appended " +
      "batch (single-writer discipline, loud)") {
    val path = tmpDir("sumstore-anon-clobber")
    val s = store(path)
    // checkpointed stream wrote batches 0..2; its checkpoint holds 2
    (0 to 2).foreach(i =>
      s.append(partials(("2026-01-01", "info", 1L)), batchId = i.toLong))
    // a batch-mode writer appends anonymously -> lands at batch=3,
    // exactly the id the stream's NEXT micro-batch will use
    s.append(partials(("2026-01-01", "info", 10L)))
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(13L))
    // the stream's overwrite-by-batchId would silently drop the
    // anonymous rows -- it must fail loudly instead
    val e = intercept[IllegalArgumentException](
      s.append(partials(("2026-01-01", "info", 99L)), batchId = 3L))
    assert(e.getMessage.contains("anonymously"), e.getMessage)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(13L),
      "the refused append must not have touched the store")
    // a keyed append at a FRESH id still works
    s.append(partials(("2026-01-01", "info", 2L)), batchId = 4L)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(15L))
  }

  test("a crashed anonymous claim (marker, no rows) never breaks the " +
      "store: reads, compaction, and later appends all proceed") {
    val path = tmpDir("sumstore-crashed-claim")
    val s = store(path)
    // simulate the crash window: the claim landed, the rows did not
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    StoreCompaction.markAnon(fs, path, 0L)
    // a store whose ONLY dir is the rows-less claim must read empty
    // and compact as a no-op, not die in parquet schema inference
    assert(StoreCompaction.visibleBatchDirs(fs, path).isEmpty)
    s.compact(spark)
    // recovery: the next anonymous append lands ABOVE the claimed id
    s.append(partials(("2026-01-01", "info", 4L)))
    val dirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).toSet
    assert(dirs.contains("batch=1"),
      s"retry must land above the crashed claim, got: $dirs")
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(4L))
    s.compact(spark)
    assert(s.read(spark).collect().map(_.getLong(2)).toSeq == Seq(4L))
  }
}
