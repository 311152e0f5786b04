package graft.scale

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.column.statistics.{BinaryStatistics, LongStatistics}
import org.apache.parquet.io.api.Binary
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** ClickHouse `bloom_filter` data-skipping index, expressed as the
  * storage format's own feature: parquet per-row-group column bloom
  * filters (ref kafka+clickhouse.md:132-141 creates the MergeTree
  * layout this indexes; ClickHouse's secondary skip indexes are the
  * feature being mirrored).
  *
  * The minmax skip index comes free in parquet (footer row-group
  * stats prune sorted columns — the sort-key write in
  * `EventSink.writeEmailEvents` / `ZOrder` already exploits it). What
  * that cannot serve is a point probe on a NON-sort high-cardinality
  * column: every row group's [min, max] spans the full id range, so
  * the whole table scans. A per-row-group bloom on that column is
  * exactly ClickHouse's `bloom_filter` granule index: the reader
  * skips any row group whose bloom rejects the key, at a false-
  * positive cost but never a false negative. parquet-mr evaluates it
  * in `RowGroupFilter` (level BLOOMFILTER, on by default) whenever
  * Spark pushes the equality predicate down — no reader-side code is
  * needed, which is why this is the Spark-first shape of the feature.
  *
  * Scale note: the bloom is per row group per file, sized from
  * expected per-group NDV and built by each writer task — nothing
  * driver-side, layout cost O(data). `rowGroupBytes` is the skip
  * granularity (ClickHouse's `index_granularity` analog): smaller
  * groups skip more precisely but carry more footer+bloom overhead.
  *
  * The family's third member, ClickHouse's `set(N)` index, is also
  * already in the format: parquet-mr's RowGroupFilter has a
  * DICTIONARY level that checks a pushed equality against the
  * dictionary page of a fully dictionary-encoded chunk — a per-group
  * exact value set that, like set(N), stops existing above an NDV
  * threshold (the dictionary falls back to plain encoding). That is
  * precisely why [[write]] disables dictionary encoding on bloom
  * columns: the two mechanisms serve disjoint NDV regimes, and
  * parquet-mr emits no bloom where the dictionary already filters
  * exactly.
  */
object SkipIndex {

  /** Canonical per-SF location of the bloom-indexed events layout —
    * shared by the registered query and Bench's pre-build/warm sweep
    * so the two can never drift onto different paths.
    */
  def defaultPath(sfDir: String): String =
    sys.props("java.io.tmpdir") + "/graft_bloomidx_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_")

  /** Write `df` as a bloom-indexed layout: range-partitioned into
    * `files` shards and sorted by `sortCols` (the primary-key analog
    * — minmax pruning on these comes free from footer stats), with a
    * per-row-group bloom filter on each of `bloomCols`. Dictionary
    * encoding is disabled on bloom columns: parquet-mr omits the
    * bloom for a fully dictionary-encoded chunk (the dictionary
    * itself filters exactly), which is the low-NDV regime a bloom
    * skip index is not for.
    */
  def write(df: DataFrame, path: String, sortCols: Seq[String],
      bloomCols: Seq[String], ndvPerGroup: Long = 4096,
      rowGroupBytes: Long = 128L << 20, files: Int = 4): Unit = {
    val sorted =
      if (sortCols.isEmpty) df
      else df.repartitionByRange(files, sortCols.map(col): _*)
        .sortWithinPartitions(sortCols.map(col): _*)
    val base = sorted.write.mode(SaveMode.Overwrite)
      .option("parquet.block.size", rowGroupBytes.toString)
      .option("parquet.page.size",
        math.max(1L << 10, rowGroupBytes / 8).toString)
    bloomCols.foldLeft(base) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c",
          ndvPerGroup.toString)
        .option(s"parquet.enable.dictionary#$c", "false")
    }.parquet(path)
  }

  /** What a probe `column = value` may skip, per skip-index level. */
  final case class Audit(bloomCandidates: Int, minmaxCandidates: Int,
      bloomsPresent: Int, totalRowGroups: Int)

  /** Driver-side audit of an equality probe (INT64 or UTF-8 string
    * column) against the layout: for each row group, evaluate (a) the
    * column's min/max footer stats and (b) its bloom filter — the
    * same two decisions parquet-mr's `RowGroupFilter` makes at scan
    * time (levels STATISTICS and BLOOMFILTER). A row group with
    * missing/foreign stats or a missing bloom is a must-scan
    * candidate at that level (skip indexes only ever prune, never
    * invent rows). Footer-only: reads no data pages, so the audit is
    * O(row groups) however large the table. Typed overloads (INT64 /
    * UTF-8 probe) keep the probe-type contract at compile time — an
    * `Any` parameter would let an Int probe compile and then miss the
    * Long match at runtime.
    */
  def candidateRowGroups(spark: SparkSession, path: String,
      column: String, value: Long): Audit =
    candidateRowGroupsImpl(spark, path, column, value)

  def candidateRowGroups(spark: SparkSession, path: String,
      column: String, value: String): Audit =
    candidateRowGroupsImpl(spark, path, column, value)

  private def candidateRowGroupsImpl(spark: SparkSession, path: String,
      column: String, value: Any): Audit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = Hdfs.of(spark, path)
    val parts = fs.listStatus(new Path(path))
      .filter(_.getPath.getName.endsWith(".parquet"))
    var bloomC = 0; var minmaxC = 0; var present = 0; var total = 0
    parts.foreach { f =>
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(f.getPath, conf))
      try {
        reader.getRowGroups.asScala.foreach { block =>
          val colMeta = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(throw new IllegalArgumentException(
              s"[skipindex] no column '$column' in ${f.getPath}"))
          total += 1
          (colMeta.getStatistics, value) match {
            case (s: LongStatistics, v: Long) if s.hasNonNullValue =>
              if (s.getMin <= v && v <= s.getMax) minmaxC += 1
            case (s: BinaryStatistics, v: String)
                if s.hasNonNullValue =>
              // the column's own comparator (unsigned lexicographic
              // for UTF8) — the ordering the footer stats were
              // written under
              val b = Binary.fromString(v)
              val cmp = s.comparator
                .asInstanceOf[java.util.Comparator[Binary]]
              if (cmp.compare(s.genericGetMin, b) <= 0 &&
                  cmp.compare(s.genericGetMax, b) >= 0)
                minmaxC += 1
            case _ => minmaxC += 1 // absent/foreign stats: must scan
          }
          val bloom = reader.getBloomFilterDataReader(block)
            .readBloomFilter(colMeta)
          if (bloom != null) present += 1
          val hash = value match {
            case v: Long => if (bloom == null) 0L else bloom.hash(v)
            case v: String =>
              if (bloom == null) 0L
              else bloom.hash(Binary.fromString(v))
            case other => throw new IllegalArgumentException(
              s"[skipindex] unsupported probe type: ${other.getClass}")
          }
          if (bloom == null || bloom.findHash(hash)) bloomC += 1
        }
      } finally reader.close()
    }
    Audit(bloomC, minmaxC, present, total)
  }

  /** Build-once events layout for the registered bloom-lookup query:
    * sorted by user_id (per-user locality — a plausible production
    * sort key that scatters event_id), bloom on event_id, granularity
    * small enough that skipping is observable at test scale
    * (ClickHouse ships 8192-row granules at any scale for the same
    * reason). Currency = the shared [[Hdfs.ensureStamped]] protocol.
    */
  def ensureEventsBloom(events: DataFrame, path: String): Unit = {
    val fs = Hdfs.of(events.sparkSession, path)
    val sortCols = Seq("user_id")
    val bloomCols = Seq("event_id")
    val ndv = 4096L
    val rgBytes = 64L << 10
    // stamp = data fingerprint + every layout parameter: a retune of
    // granularity/NDV/columns must invalidate, or ensure serves the
    // old physical layout forever (review-caught)
    val stamp = s"rows=${events.count()};sort=${sortCols.mkString("+")}" +
      s";bloom=${bloomCols.mkString("+")};ndv=$ndv;rg=$rgBytes"
    Hdfs.ensureStamped(fs, new Path(s"$path/_graft_meta"),
      Seq(new Path(s"$path/_SUCCESS")), stamp) {
      write(events, path, sortCols, bloomCols, ndvPerGroup = ndv,
        rowGroupBytes = rgBytes)
    }
  }
}
