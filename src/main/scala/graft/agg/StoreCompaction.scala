package graft.agg

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Shared compaction mechanics for the append-log stores
  * ([[SummingStore]], [[CollapsingStore]]): fold per-batch dirs into
  * one `batch=compacted` block and persist the highest numeric batch
  * id that fold absorbed, so a streaming replay of an already-folded
  * batch can be REFUSED instead of silently double-counting (the one
  * replay batch-keyed overwrites cannot make idempotent — the rows no
  * longer live in their own `batch=<id>` dir).
  *
  * The watermark lives in a `_compacted_through` marker file beside
  * the batch dirs; readers' `batch=*` globs never see it. New batches
  * with ids ABOVE the watermark append normally, so periodic
  * compaction composes with an ongoing stream.
  */
private[agg] object StoreCompaction {

  private def marker(storePath: String) =
    new Path(s"$storePath/_compacted_through")

  private def readThrough(fs: FileSystem, storePath: String): Long = {
    val m = marker(storePath)
    if (!fs.exists(m)) -1L
    else {
      val in = fs.open(m)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeThrough(fs: FileSystem, storePath: String,
      through: Long): Unit = {
    val out = fs.create(marker(storePath), true)
    try out.write(through.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Highest batch id folded into `batch=compacted` so far, or -1 if
    * never compacted (every real batch id is >= 0). */
  def compactedThrough(spark: SparkSession, storePath: String): Long =
    readThrough(
      FileSystem.get(spark.sparkContext.hadoopConfiguration), storePath)

  private def listBatchDirs(fs: FileSystem,
      storePath: String): Array[FileStatus] = {
    val base = new Path(storePath)
    if (!fs.exists(base)) Array.empty
    else fs.listStatus(base).filter(_.getPath.getName.startsWith("batch="))
  }

  /** True iff at least one `batch=` dir exists — the precondition for
    * a schema probe / fold. False on an empty store and on the
    * crash-recovery state where a prior fold deleted the batch dirs
    * but died before renaming the temp dir in. */
  def hasBatchDirs(fs: FileSystem, storePath: String): Boolean =
    listBatchDirs(fs, storePath).nonEmpty

  /** Recover the documented crash states a store can be left in when
    * no `batch=` dir exists: a prior fold that materialized `tmp` and
    * deleted the source dirs but died before the rename is FINISHED
    * (the watermark was already advanced before any delete, so only
    * the rename remains); an entirely empty store is a no-op. */
  def recoverOrNoop(fs: FileSystem, storePath: String, tmp: Path): Unit =
    if (fs.exists(tmp)) renameIn(fs, storePath, tmp)

  private def renameIn(fs: FileSystem, storePath: String,
      tmp: Path): Unit = {
    val dst = new Path(s"$storePath/batch=compacted")
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed; " +
      "folded rows remain in the temp dir")
  }

  /** Replace every `batch=` dir with the pre-materialized folded block
    * at `tmp` (renamed to `batch=compacted`) and advance the
    * watermark to the highest numeric batch id just absorbed. NOT
    * atomic for concurrent readers: between the deletes and the
    * rename a reader sees partial or no data — run compaction only
    * with no reader or replay in flight.
    *
    * The watermark is advanced BEFORE any batch dir is touched: a
    * crash after the marker write can only make [[SummingStore.append]]
    * REFUSE a replay of a not-yet-folded batch (safe — the batch-keyed
    * overwrite was idempotent anyway), never ACCEPT a replay of an
    * already-folded one (double count), which a marker-last ordering
    * would allow.
    */
  def foldBatches(fs: FileSystem, storePath: String, tmp: Path): Unit = {
    val dirs = listBatchDirs(fs, storePath)
    var maxId = -1L
    dirs.foreach { st =>
      val id = st.getPath.getName.stripPrefix("batch=")
      if (id != "compacted") maxId = math.max(maxId, id.toLong)
    }
    writeThrough(fs, storePath, math.max(readThrough(fs, storePath), maxId))
    dirs.foreach(st => fs.delete(st.getPath, true))
    renameIn(fs, storePath, tmp)
  }

  /** Cast `folded` back to the raw batch schema so post-compact
    * appends (original-width rows) still union cleanly at read time —
    * FAILING loudly on any value the narrower type cannot hold. Sums
    * widen int columns to long (and decimals to higher precision); a
    * non-ANSI downcast silently wraps an overflowing long and nulls
    * an overflowing decimal, permanently corrupting the store. The
    * guard is a per-row try_cast round-trip compiled into the same
    * projection (no extra pass, ANSI-mode-independent): a value that
    * does not survive `try_cast(target)` and cast back unchanged
    * raises instead of writing.
    */
  def castToRawSchema(folded: DataFrame, rawSchema: StructType): DataFrame =
    folded.select(folded.schema.fields.map { f =>
      val target = rawSchema(f.name).dataType
      if (target == f.dataType) col(f.name)
      else {
        val down = col(f.name).try_cast(target)
        when(col(f.name).isNotNull &&
            (down.isNull || down.cast(f.dataType) =!= col(f.name)),
          raise_error(concat(
            lit(s"compact(): folded total for column '${f.name}' does " +
              s"not fit the stored $target type (widen the store's " +
              "column type or compact more often): "),
            col(f.name).cast("string"))))
          .otherwise(down).as(f.name)
      }
    }.toSeq: _*)
}
