package graft.agg

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

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

  /** Highest batch id folded into `batch=compacted` so far, or -1 if
    * never compacted (every real batch id is >= 0). */
  def compactedThrough(spark: SparkSession, storePath: String): Long =
    readThrough(
      FileSystem.get(spark.sparkContext.hadoopConfiguration), storePath)

  /** Replace every `batch=` dir with the pre-materialized folded block
    * at `tmp` (renamed to `batch=compacted`) and advance the
    * watermark to the highest numeric batch id just absorbed. NOT
    * atomic for concurrent readers: between the deletes and the
    * rename a reader sees partial or no data — run compaction only
    * with no reader or replay in flight.
    */
  def foldBatches(fs: FileSystem, storePath: String, tmp: Path): Unit = {
    val base = new Path(storePath)
    var maxId = -1L
    if (fs.exists(base)) {
      fs.listStatus(base).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("batch=")) {
          val id = name.stripPrefix("batch=")
          if (id != "compacted") maxId = math.max(maxId, id.toLong)
          fs.delete(st.getPath, true)
        }
      }
    }
    val dst = new Path(s"$storePath/batch=compacted")
    require(fs.rename(tmp, dst), s"rename $tmp -> $dst failed; " +
      "folded rows remain in the temp dir")
    val through = math.max(readThrough(fs, storePath), maxId)
    val out = fs.create(marker(storePath), true)
    try out.write(through.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
