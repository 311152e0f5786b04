package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Sampling

/** ClickHouse `SAMPLE BY` storage analog (ref kafka+clickhouse.md:
  * 132-141 creates the MergeTree layout this extends; ClickHouse puts
  * `intHash32(UserID)` inside the PRIMARY KEY so `SAMPLE 1/8` reads
  * ~1/8 of the granules). The Spark-first shape: materialize the
  * Knuth sample key as a physical column and make it the LEADING sort
  * key of a range-partitioned sorted write — a `SAMPLE f` scan is
  * then a contiguous range slab `sample_key < f * 2^32`, pruned at
  * file level (range partitioning) and row-group level (footer
  * min/max under the pushed range predicate). Reading an f-fraction
  * sample costs ~f of the bytes at ANY table size — the whole point
  * of the clause at 100 TB, where a full-scan-then-filter "sample"
  * defeats itself.
  *
  * Sampling is BY ENTITY (the hashed id), not by row: an entity is
  * either wholly in or wholly out of the sample, so per-entity
  * analytics (funnels, retention, per-user aggregates) stay unbiased
  * — the property ClickHouse's SAMPLE BY userID exists for. The key
  * is the engine-portable Knuth hash ([[Sampling.hashKey]]), so a
  * DuckDB oracle reproduces the exact sample population with plain
  * 64-bit math.
  *
  * Layout = `base/` plus batchId-keyed delta dirs `b_<id>/` (the
  * delta discipline every store in this engine follows — and exactly
  * how ClickHouse itself ingests: each new part is internally sorted
  * by the PK, sampling included). Sample membership is a PURE
  * FUNCTION of the id, so streamed arrivals are correctly sampled the
  * moment they land; each delta batch is range-partitioned + sorted
  * by the key like the base, so slab pruning applies per delta file
  * (and per row group within), just at the batch's coarser grain
  * until [[compact]] folds it in. Visibility = the `_SUCCESS` commit
  * marker per dir, listed in ONE snapshot — a crashed append's
  * markerless dir is invisible; replay Overwrites it idempotently.
  */
object SampleLayout {

  /** 2^32 — the sample key domain; `SAMPLE f` keeps keys below
    * f * KeyDomain. */
  val KeyDomain: Long = 4294967296L

  /** The materialized sample key: [[Sampling.hashKey]] of the entity
    * id — ONE shared implementation of the engine-portable Knuth
    * hash (overflow-safe over the full long id domain), so the
    * layout, every sampler, and the SQL oracles can never drift. */
  def sampleKey(id: Column): Column = Sampling.hashKey(id)

  /** Canonical per-SF location of the sample-keyed events layout —
    * one derivation shared by the registered query and Bench's
    * pre-build/warm sweep. */
  def defaultPath(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft_sampleidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private def baseDir(path: String) = s"$path/base"
  private def deltaDir(path: String, id: Long) = s"$path/b_$id"

  /** Key-sorted write of one frame into one dir: range-partitioned
    * into `files` shards on (sample_key, sortCols...) and sorted
    * within each — a key-range slab prunes whole files via the range
    * partitioning AND row groups via footer min/max. Computes the key
    * iff the frame doesn't already carry one (so [[compact]] can
    * rewrite key-carrying rows without rehashing). */
  private def writeSorted(df: DataFrame, dir: String, id: Column,
      sortCols: Seq[String], files: Int): Unit = {
    val keyed =
      if (df.columns.contains("sample_key")) df
      else df.withColumn("sample_key", sampleKey(id))
    val keys = col("sample_key") +: sortCols.map(col)
    keyed.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** (Re)build the base: `df` with `sample_key` = hash(`id`) as the
    * LEADING sort key (ClickHouse: `ORDER BY (intHash32(UserID),
    * ...)`; `sortCols` keep their secondary locality inside each
    * slab). */
  def write(df: DataFrame, path: String, id: Column,
      sortCols: Seq[String] = Nil, files: Int = 16): Unit =
    writeSorted(df, baseDir(path), id, sortCols, files)

  /** Append a micro-batch as the batchId-keyed delta `b_<id>`, itself
    * key-sorted so slab pruning holds inside the batch at its own
    * file grain. Overwrite -> replay idempotent; the dir is visible
    * only once its `_SUCCESS` marker lands. */
  def append(batch: DataFrame, path: String, batchId: Long,
      id: Column, sortCols: Seq[String] = Nil, files: Int = 4): Unit =
    writeSorted(batch, deltaDir(path, batchId), id, sortCols, files)

  /** ONE listing snapshot of the committed dirs (base + `b_*` with a
    * `_SUCCESS` marker) — a mid-listing committer can't yield a dir
    * list that disagrees with itself. */
  private def committedDirs(spark: SparkSession,
      path: String): Seq[String] = {
    val fs = Hdfs.of(spark, path)
    val root = new Path(path)
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter(p => (p.getName == "base" || p.getName.startsWith("b_")) &&
        fs.exists(new Path(p, "_SUCCESS")))
      .map(_.toString)
  }

  /** `SAMPLE num/den` read over base + committed deltas: rows whose
    * sample key falls in the [0, num/den * 2^32) slab. Exact integer
    * threshold arithmetic (num * 2^32 / den with num <= den, no
    * overflow for sane fractions) so Spark and any SQL oracle agree
    * on the population bit-for-bit. Scale estimates by den/num. */
  def sampleScan(spark: SparkSession, path: String, num: Long,
      den: Long): DataFrame = {
    require(num > 0 && num <= den && den <= (1L << 20),
      s"sample fraction $num/$den out of range")
    val dirs = committedDirs(spark, path)
    require(dirs.nonEmpty, s"no committed sample layout at $path")
    spark.read.parquet(dirs: _*)
      .filter(col("sample_key") < lit(num * KeyDomain / den))
  }

  /** Fold every committed delta into a fresh base and retire the
    * delta dirs — answer-neutral (membership is derived from the id,
    * the fold only restores the base's file grain). Base rewrite
    * FIRST, delta deletes after: a crash between them double-counts
    * nothing on the next scan only because the rebuild is guarded by
    * the caller's currency protocol ([[ensureEvents]] stamps), and
    * the streaming caller replays its batch ids — so run compaction
    * from the single writer that owns the store, the same discipline
    * as every other store here. */
  def compact(spark: SparkSession, path: String, files: Int = 16,
      sortCols: Seq[String] = Nil): Unit = {
    val fs = Hdfs.of(spark, path)
    val dirs = committedDirs(spark, path)
    val deltas = dirs.filterNot(_.endsWith("/base"))
    if (deltas.isEmpty) return
    // staged to sever lineage from the base dir the write replaces
    // (an unstaged plan would read base while overwriting it)
    val all = Staging.materialize(spark.read.parquet(dirs: _*),
      "sample-compact")
    writeSorted(all, baseDir(path), col("sample_key"), sortCols, files)
    deltas.foreach(d => fs.delete(new Path(d), true))
  }

  /** Build-once sample-keyed events layout for the registered query.
    * Granularity small enough that slab pruning is observable at test
    * scale; currency = the shared [[Hdfs.ensureStamped]] protocol
    * (the stamp carries a layout version so pre-delta layouts
    * rebuild). */
  def ensureEvents(events: DataFrame, path: String): Unit = {
    val fs = Hdfs.of(events.sparkSession, path)
    val files = 16
    val stamp = s"rows=${events.count()};key=knuth(user_id)" +
      s";files=$files;sort=ts;layout=base+deltas"
    Hdfs.ensureStamped(fs, new Path(s"$path/_graft_meta"),
      Seq(new Path(s"${baseDir(path)}/_SUCCESS")), stamp) {
      write(events, path, col("user_id"), Seq("ts"), files)
    }
  }
}
