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

  /** Type-checked codec contract: a decoder consumes one PARTITION's
    * records as an iterator — so per-partition init (native handle,
    * model load, arena allocation) happens once in the implementation's
    * prologue, not once per record — and emits fixed-shape features. A
    * real codec binding implements this trait and drops into
    * [[extractFeatures]] compile-checked; nothing else in the pipeline
    * (schema, typed Dataset boundary, partitioning) changes.
    */
  trait MediaDecoder extends Serializable {
    def decodeBatch(records: Iterator[MediaRecord]): Iterator[MediaFeatures]
  }

  /** The container-honest stand-in codec (no image/audio libs here):
    * batch-iterates [[decodeStub]]. */
  object StubDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      // a real codec's per-partition init goes here, before the map
      records.map(decodeStub)
  }

  /** STUB DECODER — stands in for an image/audio codec (none in this
    * container). Deterministic features from the raw bytes: byte-mean,
    * byte-variance, first/last byte. A real implementation supplies a
    * [[MediaDecoder]] instead (batch-iterator signature, same as a
    * native decoder binding would use).
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
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder = StubDecoder): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions(decoder.decodeBatch _)
  }

  /** One sampled frame of a media payload. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int,
      frame: Array[Byte])

  /** Frame sampling: treat the payload as a sequence of
    * `frameBytes`-sized frames and keep every `stride`-th — the
    * one-row-to-many-rows plumbing a video pipeline needs (a real
    * demuxer replaces the `grouped` call; the flatMap boundary, frame
    * indexing, and output schema stay). Narrow: frames of a payload
    * never leave their partition.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
      frameBytes: Int, stride: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.as[MediaRecord].flatMap { rec =>
      rec.media.grouped(frameBytes).zipWithIndex
        .filter(_._2 % stride == 0)
        .map { case (f, i) => MediaFrame(rec.doc_id, i, f) }
    }
  }

  /** Resized payload with its new fixed size. */
  final case class ResizedMedia(doc_id: Long, format: String,
      size: Int, payload: Array[Byte])

  /** RESIZE STUB — stands in for an image resampler: average-pools the
    * byte stream into exactly `target` cells (deterministic; empty
    * payloads produce empty output). A real implementation replaces
    * only this function body; the typed map stage around it is the
    * production shape.
    */
  def resizeStub(rec: MediaRecord, target: Int): ResizedMedia = {
    val n = rec.media.length
    val out =
      if (n == 0) Array.emptyByteArray
      else Array.tabulate(target) { i =>
        val lo = math.min((i.toLong * n / target).toInt, n - 1)
        val hi = math.max(lo + 1,
          math.min((((i + 1).toLong * n) / target).toInt, n))
        val cell = rec.media.slice(lo, hi)
        (cell.map(_ & 0xff).sum / cell.length).toByte
      }
    ResizedMedia(rec.doc_id, rec.format, out.length, out)
  }

  /** The resize stage: same per-partition batch contract as
    * [[extractFeatures]]. */
  def resize(spark: SparkSession, media: DataFrame,
      target: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(resizeStub(_, target))
    }
  }
}
