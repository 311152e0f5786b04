package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything
  * around it — schema, typed Dataset boundary, mapPartitions batch
  * shape, feature-vector output — is the real plumbing a production
  * decoder would drop into. At 100 TB this is a narrow per-partition
  * stage: no shuffle, decode parallelism == input partitions, and the
  * binary payload never crosses the wire after the scan.
  */
object Multimodal {

  /** A media record: payload + typed metadata, as a production pipeline
    * would model an image/audio blob column. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte],
      format: String)

  /** Fixed-shape decode output. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Int,
      format: String, features: Array[Double])

  /** Builds a media table from `documents` by treating the UTF-8 bytes
    * of `text` as the opaque payload (testdata has no real blobs); the
    * schema and downstream plumbing are payload-agnostic. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("media"),
      (when(col("doc_id") % 2 === 0, "png").otherwise("wav")).as("format"))

  /** STUB DECODER — stands in for an image/audio codec (none in this
    * container). Deterministic features from the raw bytes: byte-mean,
    * byte-variance, first/last byte. A real implementation replaces
    * only this function body (same batch-iterator signature a native
    * decoder binding would use).
    */
  def decodeStub(rec: MediaRecord): MediaFeatures = {
    val bytes = rec.media
    val n = bytes.length
    val mean = if (n == 0) 0.0 else bytes.map(_ & 0xff).sum.toDouble / n
    val variance = if (n == 0) 0.0
    else bytes.map(b => { val d = (b & 0xff) - mean; d * d }).sum / n
    MediaFeatures(rec.doc_id, n, rec.format,
      Array(mean, variance,
        if (n == 0) 0.0 else (bytes.head & 0xff).toDouble,
        if (n == 0) 0.0 else (bytes.last & 0xff).toDouble))
  }

  /** The decode stage: typed boundary + per-partition batch iteration,
    * exactly the shape a vectorized decoder (or native lib with
    * per-batch init cost) needs — per-partition setup happens once per
    * iterator, not once per record.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame)
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder init would go here (native handle, model)
      it.map(decodeStub)
    }
  }
}
