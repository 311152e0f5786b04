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
  * 64-bit math. The public write paths ALWAYS recompute the key from
  * the id (a caller-supplied `sample_key` column is dropped) —
  * membership stays a pure function of the id by construction.
  *
  * Layout = a generation-named base `base_g<g>/` plus batchId-keyed
  * delta dirs `b_<id>/` (the delta discipline every store in this
  * engine follows — and exactly how ClickHouse itself ingests: each
  * new part is internally sorted by the PK, sampling key included).
  * Each delta batch is range-partitioned + key-sorted like the base,
  * so slab pruning applies per delta file (and per row group within)
  * at the batch's grain until [[compact]] folds it in.
  *
  * Reader-safety protocol (the [[graft.agg.StoreCompaction]]
  * manifest-with-grace scheme, reduced to this layout): the visible
  * view is `_manifest` = "gen through" — readers scan
  * `base_g<gen>` + committed deltas with id > through, resolved in
  * ONE listing. [[compact]] lands the folded block as the INVISIBLE
  * next generation, atomically flips the manifest (complete view ->
  * complete view; a crash before the flip changes nothing, a crash
  * after it leaves superseded dirs invisible — never double-counted),
  * and deletes only dirs the PREVIOUS publish already superseded (the
  * grace window for in-flight readers). A crashed append's markerless
  * delta dir is invisible; replay Overwrites it idempotently. Single
  * writer per store (stream OR batch owner), readers unrestricted.
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

  private def baseDir(path: String, gen: Long) = s"$path/base_g$gen"
  private def deltaDir(path: String, id: Long) = s"$path/b_$id"
  private def manifestPath(path: String) = new Path(s"$path/_manifest")

  /** The published view: base generation + the delta-id watermark at
    * its publish time (deltas at or below it are folded/superseded). */
  private[scale] final case class Manifest(gen: Long, through: Long)

  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Option[Manifest] = {
    val m = manifestPath(path)
    if (!fs.exists(m)) None
    else {
      val in = fs.open(m)
      val txt =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      val Array(g, t) = txt.split(' ')
      Some(Manifest(g.toLong, t.toLong))
    }
  }

  private def publish(fs: org.apache.hadoop.fs.FileSystem, path: String,
      m: Manifest): Unit =
    Hdfs.atomicWrite(fs, manifestPath(path), s"${m.gen} ${m.through}")

  /** Key-sorted write of one frame into one dir. `id` = Some(col):
    * recompute `sample_key` from it, dropping any caller-supplied
    * column (the public paths — membership must derive from the id);
    * None: the frame already carries the layout's own key (the
    * compact fold rewriting its own rows). */
  private def writeSorted(df: DataFrame, dir: String,
      id: Option[Column], sortCols: Seq[String], files: Int): Unit = {
    val keyed = id match {
      case Some(c) =>
        df.drop("sample_key").withColumn("sample_key", sampleKey(c))
      case None =>
        require(df.columns.contains("sample_key"),
          "internal fold frame lost its sample_key column")
        df
    }
    val keys = col("sample_key") +: sortCols.map(col)
    keyed.repartitionByRange(files, keys: _*)
      .sortWithinPartitions(keys: _*)
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

  /** (Re)build the layout from `df` — publishes a fresh generation 0
    * after WIPING the store dir: a rebuild means the source changed,
    * so any older base, stale deltas (derived from the pre-refresh
    * source), and legacy pre-generation files are all superseded; a
    * surviving stale dir would contaminate every later scan
    * (review-caught). Batch-owner entrypoint — never run it against a
    * store a stream is maintaining (single-writer discipline). */
  def write(df: DataFrame, path: String, id: Column,
      sortCols: Seq[String] = Nil, files: Int = 16): Unit = {
    val fs = Hdfs.of(df.sparkSession, path)
    fs.delete(new Path(path), true)
    writeSorted(df, baseDir(path, 0L), Some(id), sortCols, files)
    publish(fs, path, Manifest(0L, -1L))
  }

  /** Append a micro-batch as the batchId-keyed delta `b_<id>`, itself
    * key-sorted so slab pruning holds inside the batch at its own
    * file grain. Overwrite -> replay idempotent; the dir is visible
    * only once its `_SUCCESS` marker lands AND its id sits above the
    * manifest watermark (so a replay of an already-folded batch can
    * never double-count). */
  def append(batch: DataFrame, path: String, batchId: Long,
      id: Column, sortCols: Seq[String] = Nil, files: Int = 4): Unit =
    writeSorted(batch, deltaDir(path, batchId), Some(id), sortCols,
      files)

  /** ONE listing snapshot of the visible dirs under the current
    * manifest: `base_g<gen>` + committed (`_SUCCESS`) deltas with
    * id > through. A single glob resolves every commit marker in one
    * metadata round trip (an exists() per delta is an N+1 on object
    * stores). */
  private[scale] def committedDirs(spark: SparkSession,
      path: String): Seq[String] = {
    val fs = Hdfs.of(spark, path)
    readManifest(fs, path) match {
      case None => Nil
      case Some(Manifest(gen, through)) =>
        val marks = fs.globStatus(
          new Path(path, "{base_g*,b_*}/_SUCCESS"))
        (if (marks == null) Seq.empty[Path]
         else marks.toSeq.map(_.getPath.getParent))
          .filter { p =>
            val n = p.getName
            n == s"base_g$gen" ||
              (n.startsWith("b_") &&
                n.stripPrefix("b_").toLongOption.exists(_ > through))
          }
          .map(_.toString)
    }
  }

  /** `SAMPLE num/den` read over the manifest view: rows whose sample
    * key falls in the [0, num/den * 2^32) slab. Exact integer
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

  /** Fold the visible deltas into the next base generation and flip
    * the manifest — reader-safe and crash-safe per the class-doc
    * protocol: the fold lands invisible, the flip is atomic
    * (complete view -> complete view), superseded dirs outlive the
    * flip by one fold as the in-flight readers' grace window, and a
    * crash anywhere leaves either the old complete view or the new
    * one — never a double count (review-caught: the naive
    * rewrite-then-delete double-counted every delta row if the
    * deletes didn't run). `files`/`sortCols` have no defaults: the
    * caller must restate the layout's parameters or the rewrite would
    * silently drop the secondary sort while the ensure stamp still
    * claims it (the Hdfs.ensureStamped failure mode). */
  def compact(spark: SparkSession, path: String, files: Int,
      sortCols: Seq[String]): Unit = {
    val fs = Hdfs.of(spark, path)
    val cur = readManifest(fs, path).getOrElse(
      throw new IllegalStateException(s"no manifest at $path"))
    // ONE visible-view snapshot drives the whole fold (single writer:
    // nothing else mutates the store between these steps)
    val view = committedDirs(spark, path)
    // grace GC: retire dirs the PREVIOUS publish already superseded
    val live = view.map(new Path(_).getName).toSet
    fs.listStatus(new Path(path)).toSeq.map(_.getPath)
      .filter { p =>
        val n = p.getName
        (n.startsWith("base_g") || n.startsWith("b_")) && !live(n)
      }
      .foreach(p => fs.delete(p, true))
    val deltas = view.filterNot(_.endsWith(s"/base_g${cur.gen}"))
    if (deltas.isEmpty) return
    val through = deltas
      .map(d => new Path(d).getName.stripPrefix("b_").toLong)
      .foldLeft(cur.through)(math.max)
    // staged to sever lineage from the dirs the view replaces
    val folded = Staging.materialize(
      spark.read.parquet(view: _*), "sample-compact")
    writeSorted(folded, baseDir(path, cur.gen + 1), None, sortCols,
      files)
    publish(fs, path, Manifest(cur.gen + 1, through))
  }

  /** Build-once sample-keyed events layout for the registered query.
    * Granularity small enough that slab pruning is observable at test
    * scale; currency = the shared [[Hdfs.ensureStamped]] protocol
    * (the stamp carries a layout version so pre-manifest layouts
    * rebuild). */
  def ensureEvents(events: DataFrame, path: String): Unit = {
    val fs = Hdfs.of(events.sparkSession, path)
    val files = 16
    val stamp = s"rows=${events.count()};key=knuth(user_id)" +
      s";files=$files;sort=ts;layout=manifest-v1"
    // the manifest is the success marker: it is written LAST by
    // write() (so a mid-build crash reads as not-current -> rebuild)
    // and, unlike base_g0, it survives compaction to later
    // generations
    Hdfs.ensureStamped(fs, new Path(s"$path/_graft_meta"),
      Seq(manifestPath(path)), stamp) {
      write(events, path, col("user_id"), Seq("ts"), files)
    }
  }
}
