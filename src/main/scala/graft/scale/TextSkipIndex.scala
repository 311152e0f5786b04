package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GramBloom

/** ClickHouse `ngrambf_v1` / `tokenbf_v1` text skip index, Spark-first
  * (ref kafka+clickhouse.md:132-141 is the MergeTree layout such
  * secondary indexes attach to). Substring and token predicates are
  * the two text filters parquet cannot push down — no footer stat or
  * column bloom helps `text LIKE '%needle%'` — so at 100 TB they read
  * every byte of every text chunk. This layout attaches a gram-bloom
  * SIDECAR: one row per data file carrying a bloom over all character
  * 4-grams and a bloom over all tokens of that file's text.
  *
  * Query = two-phase, both exact:
  *   1. prune: scan the sidecar (one row per file, distributed) and
  *      keep files whose bloom admits EVERY gram of the needle. A
  *      true match contains all its grams, so no false negatives —
  *      pruning never loses rows; false positives only cost a scan.
  *   2. scan: read only surviving files and re-apply the exact
  *      predicate (contains / token equality).
  *
  * Scale notes: the sidecar build is one distributed text pass whose
  * shuffle carries fixed-size bloom bitsets, not text (map-side
  * partial aggregation — see [[GramBloom.GramBloomAgg]]); the probe
  * collects only SURVIVING file names (worst case the full file list,
  * the same listing any parquet read materializes); sidecar size is
  * O(files), ~2 x 80 KB per data file at the defaults — 1e5 files of
  * a 100 TB table cost a ~16 GB sidecar table, itself a distributed
  * scan. Grain = one file (ClickHouse's is one granule): finer files
  * skip more precisely at more listing overhead, the same dial as
  * `index_granularity`.
  */
object TextSkipIndex {

  /** Character n-gram width (ClickHouse commonly ships
    * `ngrambf_v1(4, ...)`); `n = 0` is the token mode throughout. */
  val N = 4

  /** Canonical per-SF layout location, shared by the registered
    * queries and Bench's pre-build/warm sweep. */
  def defaultPath(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft_gramidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  private def dataDir(path: String) = s"$path/data"
  private def sidecarDir(path: String) = s"$path/_gram_blooms"

  /** Write `df` as a gram-indexed layout: `files` range-partitioned
    * sorted data files plus the bloom sidecar (ngram + token bloom
    * per file). The sidecar pass re-reads the written text once —
    * the index build's one-time linear cost. */
  def write(df: DataFrame, path: String, textCol: String = "text",
      sortCols: Seq[String] = Seq("doc_id"), files: Int = 16,
      expectedGrams: Long = 1L << 16, fpp: Double = 0.01): Unit = {
    val spark = df.sparkSession
    df.repartitionByRange(files, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(dataDir(path))
    buildSidecar(spark, dataDir(path), sidecarDir(path), textCol,
      expectedGrams, fpp)
  }

  /** The sidecar build both [[write]] and [[append]] commit with: one
    * distributed pass over the just-written data files, one bloom row
    * per file. Shared so a bloom retune can never fork base and delta
    * sidecar schemas/parameters. */
  private def buildSidecar(spark: SparkSession, dataPath: String,
      sidecarPath: String, textCol: String, expectedGrams: Long,
      fpp: Double): Unit =
    spark.read.parquet(dataPath)
      .select(col("_metadata.file_path").as("file"), col(textCol))
      .groupBy(col("file"))
      .agg(
        GramBloom.gram_bloom(col(textCol), N, expectedGrams, fpp)
          .as("ngram_bloom"),
        GramBloom.gram_bloom(col(textCol), 0, expectedGrams, fpp)
          .as("token_bloom"))
      .write.mode(SaveMode.Overwrite).parquet(sidecarPath)

  /** Append a document batch to an existing layout: the batch's data
    * files land under `data/b_<batchId>/`, its sidecar rows under
    * `_gram_blooms/b_<batchId>/` (the batchId-keyed delta discipline
    * every store in this engine follows), so replaying a micro-batch
    * after a crash is idempotent. The commit protocol has to survive
    * REPLAY of an already-committed batch, not just first-time crash:
    * the sidecar rows reference physical data file names, and an
    * Overwrite of the data dir deletes the files a still-committed
    * sidecar points at. So: retract the sidecar FIRST (the batch
    * turns invisible — sidecar rows are the only route to a delta's
    * files), then rewrite data, then recommit the sidecar. Every
    * crash window leaves the batch invisible-not-dangling, and the
    * next replay heals it. No base rebuild, no touch of other
    * batches; [[write]]'s full Overwrite subsumes all deltas on the
    * next rebuild. */
  def append(batch: DataFrame, path: String, batchId: Long,
      textCol: String = "text", sortCols: Seq[String] = Seq("doc_id"),
      files: Int = 1, expectedGrams: Long = 1L << 16,
      fpp: Double = 0.01): Unit = {
    val spark = batch.sparkSession
    val bData = s"${dataDir(path)}/b_$batchId"
    val bSidecar = s"${sidecarDir(path)}/b_$batchId"
    import CommitProtocol.{run, step}
    run("gramidx-append", Seq(
      // the batch turns invisible: sidecar rows are the only route to
      // a delta's files, so the data Overwrite below can never delete
      // files a still-committed sidecar references by physical name
      step("retract-sidecar") {
        Hdfs.of(spark, bSidecar).delete(new Path(bSidecar), true)
      },
      // same sortCols contract as write() (round-10 ADVICE: a
      // hardcoded doc_id gave custom-sorted layouts deltas with a
      // different physical order, and rejected frames write()
      // accepted)
      step("write-data") {
        batch.repartitionByRange(files, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
          .write.mode(SaveMode.Overwrite).parquet(bData)
      },
      step("commit-sidecar") {
        buildSidecar(spark, bData, bSidecar, textCol, expectedGrams, fpp)
      }))
  }

  /** Data files whose bloom admits every gram of `needle` — the set
    * phase 2 must scan. Distributed sidecar filter; only survivors
    * reach the driver. Recursive lookup spans the base sidecar and
    * every committed batch delta; a data file with no sidecar row
    * (an uncommitted append) is invisible by construction. */
  def survivingFiles(spark: SparkSession, path: String, needle: String,
      token: Boolean): Seq[String] =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(sidecarDir(path))
      .filter(GramBloom.gram_bloom_admits(
        col(if (token) "token_bloom" else "ngram_bloom"), needle,
        if (token) 0 else N))
      .select("file").collect().map(_.getString(0)).toSeq

  private def scanPruned(spark: SparkSession, path: String,
      surviving: Seq[String]): DataFrame =
    if (surviving.isEmpty)
      // schema-only read: no data file opens under an always-false
      // filter, but the frame keeps the layout's exact schema
      spark.read.option("recursiveFileLookup", "true")
        .parquet(dataDir(path)).filter(lit(false))
    else spark.read.parquet(surviving: _*)

  /** Exact substring search through the index:
    * rows where `textCol` contains `needle`. */
  def searchSubstring(spark: SparkSession, path: String, needle: String,
      textCol: String = "text"): DataFrame =
    scanPruned(spark, path, survivingFiles(spark, path, needle,
      token = false))
      .filter(col(textCol).contains(needle))

  /** Exact token search through the index: rows where `textCol`
    * splits (on [[GramBloom.TokenSep]]) into a list containing
    * `tok`. */
  def searchToken(spark: SparkSession, path: String, tok: String,
      textCol: String = "text"): DataFrame = {
    require(tok.nonEmpty &&
      GramBloom.TokenSep.r.findFirstIn(tok).isEmpty,
      s"not a single token: '$tok'")
    scanPruned(spark, path, survivingFiles(spark, path, tok,
      token = true))
      .filter(array_contains(split(col(textCol), GramBloom.TokenSep),
        tok))
  }

  /** Build-once documents layout for the registered queries. Currency
    * = the shared [[Hdfs.ensureStamped]] protocol (stamp deleted
    * before the TWO writes, rewritten after both — a crash between
    * them reads as not-current -> rebuild). */
  def ensureDocuments(documents: DataFrame, path: String): Unit = {
    val fs = Hdfs.of(documents.sparkSession, path)
    val files = 16
    val expectedGrams = 1L << 16
    val fpp = 0.01
    // stamp = data fingerprint + every layout parameter (gram width,
    // file grain, bloom sizing): a retune must invalidate
    val stamp = s"rows=${documents.count()};n=$N;files=$files" +
      s";grams=$expectedGrams;fpp=$fpp"
    Hdfs.ensureStamped(fs, new Path(s"$path/_graft_meta"),
      Seq(new Path(s"${dataDir(path)}/_SUCCESS"),
        new Path(s"${sidecarDir(path)}/_SUCCESS")), stamp) {
      write(documents, path, files = files,
        expectedGrams = expectedGrams, fpp = fpp)
    }
  }
}
