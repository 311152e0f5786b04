package graft.scale

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table maintenance for streaming-append layouts.
  *
  * Micro-batch appends produce one-file-per-batch-per-partition; at
  * 100 TB that is millions of small files — scan planning and footer
  * reads dominate. [[compactPartitioned]] rewrites each hive partition
  * of a parquet table into ~`targetRowsPerFile`-sized files, preserving
  * the clustering sort (so min/max skipping keeps working), atomically
  * per partition via a temp-dir swap.
  *
  * This is the raw-table sibling of `agg.SummingStore.compact` (which
  * additionally merges rows); together they are the background-merge
  * analog of the reference's MergeTree engines
  * (kafka+clickhouse.md:396-401).
  */
object Maintenance {

  /** ReplacingMergeTree-style read: keep only the newest row per key,
    * newest = greatest (version, tie). ClickHouse's Replacing engine
    * resolves duplicates lazily at merge time; on Spark the same
    * contract is this windowed filter at read (or inside
    * [[compactPartitioned]]'s rewrite to make it physical). One
    * shuffle on the key; `tie` must make the order total for a
    * deterministic survivor.
    */
  def latestByKey(df: DataFrame, keys: Seq[Column], version: Column,
      tie: Column): DataFrame = {
    val w = Window.partitionBy(keys: _*)
      .orderBy(version.desc, tie.desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Physical Replacing merge: rewrite a parquet table keeping only
    * the newest row per key — the background-merge half of the
    * Replacing contract ([[latestByKey]] being the read-time half;
    * after compaction reads no longer pay the window). Same temp-dir
    * swap discipline as [[compactPartitioned]].
    */
  def compactReplacing(spark: SparkSession, path: String,
      keyCols: Seq[String], versionCol: String, tieCol: String,
      numFiles: Int = 1): Unit = {
    val fs = Hdfs.of(spark, path)
    val merged = latestByKey(spark.read.parquet(path),
      keyCols.map(col), col(versionCol), col(tieCol))
    val tmp = new Path(path + "__compact_tmp")
    merged.repartition(numFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val dst = new Path(path)
    swapInPlace(fs, tmp, dst)
  }

  /** Replace `dst` with `tmp` so readers never see a partially-written
    * dir: rename the live dir aside to a backup, rename the rewrite in,
    * then drop the backup. There IS a brief window between the two
    * renames where `dst` does not exist (a reader starting then gets
    * path-not-found and should retry); a crash in that window leaves
    * the backup on disk for manual recovery instead of losing the
    * partition.
    */
  private def swapInPlace(fs: FileSystem, tmp: Path, dst: Path): Unit = {
    val backup = new Path(dst.getParent, "_backup_" + dst.getName)
    fs.delete(backup, true)
    require(fs.rename(dst, backup), s"rename $dst -> $backup failed")
    if (!fs.rename(tmp, dst)) {
      // Restore the original before failing so the table stays live;
      // if even the restore fails the data survives at `backup`.
      val restored = fs.rename(backup, dst)
      throw new IllegalStateException(
        s"rename $tmp -> $dst failed" +
          (if (restored) " (original restored)"
           else s" AND restore failed — data preserved at $backup"))
    }
    fs.delete(backup, true)
  }

  def compactPartitioned(spark: SparkSession, path: String,
      partitionCol: String, sortCols: Seq[String],
      targetRowsPerFile: Long = 1000000L): Unit = {
    val fs = Hdfs.of(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) return
    val partDirs = fs.listStatus(base)
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(s"$partitionCol="))
    partDirs.foreach { st =>
      val dir = st.getPath
      val df = spark.read.parquet(dir.toString)
      val n = df.count()
      val files = math.max(1, math.ceil(n.toDouble / targetRowsPerFile)
        .toInt)
      val tmp = new Path(dir.getParent, s"_compact_${dir.getName}")
      df.repartition(files)
        .sortWithinPartitions(sortCols.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      swapInPlace(fs, tmp, dir)
    }
  }

  /** TTL expiry for a hive-partitioned table (ClickHouse `TTL ...
    * DELETE` analog, kafka+clickhouse.md's MergeTree day-parts are the
    * layout this assumes): DROP whole partition directories whose
    * partition VALUE the predicate marks expired. Never rewrites or
    * scans data — at 100 TB retention is a metadata operation on
    * day-parts, one directory delete per expired day, exactly like
    * ClickHouse dropping aged parts. Returns the dropped values.
    *
    * The predicate sees the raw partition-value string (e.g.
    * "2024-01-05" for `day=2024-01-05`); callers compare against their
    * cutoff lexicographically (ISO dates / yyyymmdd keys sort
    * correctly as strings).
    */
  def expireTtl(spark: SparkSession, path: String, partitionCol: String,
      isExpired: String => Boolean): Seq[String] = {
    val fs = Hdfs.of(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) return Nil
    val prefix = s"$partitionCol="
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .map(st => st.getPath)
      .filter(p => isExpired(p.getName.stripPrefix(prefix)))
      .map { p => fs.delete(p, true); p.getName.stripPrefix(prefix) }
      .sorted
  }

  /** Row-level delete on a hive-partitioned parquet table — the
    * ClickHouse mutation analog (`ALTER TABLE ... DELETE WHERE`), and
    * the GDPR-erasure primitive a training-data store must have.
    * Copy-on-write per partition with the same temp-dir swap as
    * [[compactPartitioned]]; partitions are touched only when
    *
    *  - `partitionPrune` admits their partition value (pass a real
    *    pruner whenever the predicate correlates with the partition
    *    key — then this is day-part-local work, not a table rewrite),
    *    and
    *  - they actually contain matching rows (checked with one
    *    column-pruned scan per candidate partition — a no-match
    *    partition costs a predicate scan but ZERO write
    *    amplification).
    *
    * This mirrors ClickHouse's own mutation cost model: parts whose
    * min/max exclude the predicate are skipped, the rest are
    * rewritten. Returns the partition values actually rewritten.
    */
  def deleteWhere(spark: SparkSession, path: String, partitionCol: String,
      cond: Column,
      partitionPrune: String => Boolean = _ => true): Seq[String] = {
    mutatePartitions(spark, path, partitionCol, cond, partitionPrune,
      df => df.filter(!coalesce(cond, lit(false))))
  }

  /** Row-level update (`ALTER TABLE ... UPDATE col = expr WHERE`):
    * every column in `set` becomes `when(cond, expr)` on matching
    * rows and stays untouched otherwise. Same pruning + copy-on-write
    * discipline as [[deleteWhere]]. The partition column itself must
    * not be updated (a partition-moving update is a delete + insert,
    * as in ClickHouse). Returns the partition values rewritten.
    */
  def updateWhere(spark: SparkSession, path: String, partitionCol: String,
      cond: Column, set: Map[String, Column],
      partitionPrune: String => Boolean = _ => true): Seq[String] = {
    require(!set.contains(partitionCol),
      s"cannot update partition column $partitionCol in place")
    mutatePartitions(spark, path, partitionCol, cond, partitionPrune,
      df => set.foldLeft(df) { case (d, (name, expr)) =>
        d.withColumn(name, when(cond, expr).otherwise(col(name)))
      })
  }

  private def mutatePartitions(spark: SparkSession, path: String,
      partitionCol: String, cond: Column,
      partitionPrune: String => Boolean,
      rewrite: DataFrame => DataFrame): Seq[String] = {
    val fs = Hdfs.of(spark, path)
    val base = new Path(path)
    if (!fs.exists(base)) return Nil
    val prefix = s"$partitionCol="
    fs.listStatus(base).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .sortBy(_.getPath.getName)
      .flatMap { st =>
        val dir = st.getPath
        if (!partitionPrune(dir.getName.stripPrefix(prefix))) None
        else {
          val df = spark.read.parquet(dir.toString)
          if (df.filter(cond).isEmpty) None
          else {
            val tmp = new Path(dir.getParent, s"_mutate_${dir.getName}")
            rewrite(df).write.mode(SaveMode.Overwrite)
              .parquet(tmp.toString)
            swapInPlace(fs, tmp, dir)
            Some(dir.getName.stripPrefix(prefix))
          }
        }
      }
  }

  /** Parquet file count under a partitioned table (diagnostic). */
  def dataFileCount(spark: SparkSession, path: String): Int = {
    val fs = Hdfs.of(spark, path)
    def walk(p: Path): Int =
      fs.listStatus(p).map { st =>
        if (st.isDirectory) walk(st.getPath)
        else if (st.getPath.getName.endsWith(".parquet")) 1
        else 0
      }.sum
    val base = new Path(path)
    if (fs.exists(base)) walk(base) else 0
  }
}
