package graft.pipeline

import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Multimodal

/** Streaming media-ingest contract: arriving base64 payloads decode
  * through the real codecs per micro-batch (stats equal a direct batch
  * decode of the same payloads), corrupt/unknown payloads dead-letter
  * with doc-tagged errors instead of failing the stream, and a
  * same-checkpoint restart re-ingests nothing (exactly-once via
  * batchId-keyed overwrites).
  */
class MediaPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def png(id: Long): Array[Byte] =
    Multimodal.pngBytes(8, 4, (x, y) => Multimodal.packRgb(
      ((id * 17 + x * 3 + y * 5) % 256).toInt,
      ((id * 19 + x * 3 + y * 5) % 256).toInt,
      ((id * 23 + x * 3 + y * 5) % 256).toInt))

  private def wav(id: Long): Array[Byte] =
    Multimodal.wavBytes(8000,
      Array.tabulate(64)(i => ((id * 31 + i * 17) % 256).toByte))

  private def line(id: Long, bytes: Array[Byte], fmt: String): String =
    s"""{"doc_id":$id,"media_b64":"${Base64.getEncoder
      .encodeToString(bytes)}","format":"$fmt"}"""

  test("decode-per-batch == direct decode; corrupt and unknown " +
      "payloads dead-letter doc-tagged; restart ingests nothing new") {
    val src = tmpDir("media-src")
    val store = tmpDir("media-store")
    val ckpt = tmpDir("media-ckpt")
    val good = (0L until 10L).map(id =>
      if (id % 2 == 0) line(id, png(id), "png")
      else line(id, wav(id), "wav"))
    val bad = Seq(
      line(100L, "not a png at all".getBytes, "png"), // corrupt body
      line(101L, wav(101L), "gif")) // no decoder for the format
    Files.write(Paths.get(src, "f0.json"),
      (good.take(5) ++ bad).mkString("\n").getBytes)
    Files.write(Paths.get(src, "f1.json"),
      good.drop(5).mkString("\n").getBytes)

    MediaPipeline.start(spark, src, store, ckpt)
      .awaitTermination(120000)

    val stats = MediaPipeline.stats(spark, store)
      .select(col("doc_id"), col("format"), col("features"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getSeq[Double](2))).toMap
    assert(stats.size == 10)
    // differential: the streamed stats equal a direct batch decode
    val direct = Multimodal.extractFeatures(spark,
        (0L until 10L).map(id =>
          if (id % 2 == 0) Multimodal.MediaRecord(id, png(id), "png")
          else Multimodal.MediaRecord(id, wav(id), "wav")).toDF(),
        Multimodal.MixedRealDecoder)
      .collect().map(f => f.doc_id -> (f.format, f.features.toSeq)).toMap
    assert(stats == direct)

    val rejects = MediaPipeline.rejects(spark, store)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("error")).toMap
    assert(rejects.keySet == Set(100L, 101L))
    assert(rejects(100L).contains("doc 100"))
    assert(rejects(101L).contains("doc 101") &&
      rejects(101L).contains("gif"))

    // same-checkpoint restart: nothing re-ingests, nothing duplicates
    MediaPipeline.start(spark, src, store, ckpt)
      .awaitTermination(120000)
    assert(MediaPipeline.stats(spark, store).count() == 10)
    assert(MediaPipeline.rejects(spark, store).count() == 2)
  }

  test("a replayed micro-batch overwrites itself (batchId-keyed)") {
    val store = tmpDir("media-replay")
    val batch = Seq((1L, Base64.getEncoder.encodeToString(wav(1L)),
      "wav")).toDF("doc_id", "media_b64", "format")
    MediaPipeline.ingestBatch(batch, store, batchId = 7L)
    MediaPipeline.ingestBatch(batch, store, batchId = 7L) // replay
    assert(MediaPipeline.stats(spark, store).count() == 1)
  }

  test("malformed wire rows (null doc_id/format/payload) dead-letter " +
      "instead of killing the batch") {
    val store = tmpDir("media-nulls")
    val rows = Seq(
      (Some(5L), Some(Base64.getEncoder.encodeToString(wav(5L))),
        Some("wav")), // good
      (None, Some("AAAA"), Some("png")), // null doc_id
      (Some(6L), None, Some("png")), // null payload
      (Some(7L), Some("AAAA"), None)) // null format
      .toDF("doc_id", "media_b64", "format")
    MediaPipeline.ingestBatch(rows, store, batchId = 0L)
    assert(MediaPipeline.stats(spark, store)
      .select("doc_id").as[Long].collect().toSeq == Seq(5L))
    val rej = MediaPipeline.rejects(spark, store)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("error")).toMap
    assert(rej.keySet == Set(-1L, 6L, 7L))
    assert(rej(7L).contains("'?'")) // the null-format sentinel
  }

  test("phash dedup tier: cross-batch AND within-batch perceptual " +
      "duplicates route to the dups delta; distinct-signal audio " +
      "stays fresh; " +
      "restart ingests nothing") {
    import graft.ops.Multimodal
    def bmpOf(id: Long, k: Long) = line(id,
      Multimodal.bmpBytes(8, 4, (x, y) => Multimodal.packRgb(
        Multimodal.synthCell(k, x, y, 0),
        Multimodal.synthCell(k, x, y, 1),
        Multimodal.synthCell(k, x, y, 2))), "bmp")
    def pngUp(id: Long, k: Long) = line(id,
      Multimodal.pngBytes(16, 8, (x, y) => Multimodal.packRgb(
        Multimodal.synthCell(k, x / 2, y / 2, 0),
        Multimodal.synthCell(k, x / 2, y / 2, 1),
        Multimodal.synthCell(k, x / 2, y / 2, 2))), "png")
    val src = tmpDir("mediadup-src")
    val store = tmpDir("mediadup-store")
    val ckpt = tmpDir("mediadup-ckpt")
    // batch boundary rides the file boundary under AvailableNow +
    // maxFilesPerTrigger default? AvailableNow may group both files
    // into one batch — within/cross-batch split is asserted by doc_id
    // outcome, which is identical either way: lower id keeps, the
    // rest dup (the tier's contract is order-deterministic).
    Files.write(Paths.get(src, "f0.json"), Seq(
      bmpOf(0L, 0L), // fresh image
      bmpOf(2L, 20L), // fresh image
      line(1L, wav(1L), "wav")) // audio: distinct signal, fresh
      .mkString("\n").getBytes)
    Files.write(Paths.get(src, "f1.json"), Seq(
      pngUp(10L, 0L), // re-encoded 2x upscale of doc 0 -> dup
      bmpOf(12L, 40L), // fresh
      bmpOf(14L, 40L), // same image again -> dup of 12
      line(13L, wav(13L), "wav"))
      .mkString("\n").getBytes)
    MediaPipeline.start(spark, src, store, ckpt, phashDedup = true)
      .awaitTermination(120000)
    val kept = MediaPipeline.stats(spark, store)
      .select("doc_id").as[Long].collect().toSet
    val dups = MediaPipeline.dups(spark, store)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("phash")).toMap
    assert(kept == Set(0L, 1L, 2L, 12L, 13L))
    assert(dups.keySet == Set(10L, 14L))
    // the dup rows carry the fingerprint that matched doc 0's image
    val expected = Multimodal.perceptualHashes(spark,
        Seq(Multimodal.MediaRecord(0L, Multimodal.bmpBytes(8, 4,
          (x, y) => Multimodal.packRgb(
            Multimodal.synthCell(0L, x, y, 0),
            Multimodal.synthCell(0L, x, y, 1),
            Multimodal.synthCell(0L, x, y, 2))), "bmp")).toDF())
      .collect().head.phash
    assert(dups(10L) == expected)
    // same-checkpoint restart: nothing re-ingests
    MediaPipeline.start(spark, src, store, ckpt, phashDedup = true)
      .awaitTermination(120000)
    assert(MediaPipeline.stats(spark, store).count() == 5)
    assert(MediaPipeline.dups(spark, store).count() == 2)
  }

  test("phash dedup tier: a duplicated wire doc_id re-attaching a " +
      "non-decodable payload to a decodable id dead-letters the bad " +
      "payload instead of failing the micro-batch forever") {
    // round-12 ADVICE (medium): the decodable-ids join pulls EVERY
    // media row with that doc_id into the hash pass — one decodable
    // png plus a corrupt body and a wav under the SAME id means the
    // hash pass sees payloads decodePixelsAny throws on. The stream
    // must finish (checkpoint replay of a thrown batch retries the
    // same data forever), the good png must be kept + fingerprinted,
    // and the throwing payloads must land in rejects.
    val src = tmpDir("mediadupid-src")
    val store = tmpDir("mediadupid-store")
    val ckpt = tmpDir("mediadupid-ckpt")
    // doc 2 uses the middle-square synthCell pattern: the plain
    // linear-gradient png(id) images all share ONE dHash (monotone in
    // x regardless of id — the documented linearity trap), which
    // would make doc 2 a perceptual dup of doc 0 here
    val png2 = Multimodal.pngBytes(8, 4, (x, y) => Multimodal.packRgb(
      Multimodal.synthCell(40L, x, y, 0),
      Multimodal.synthCell(40L, x, y, 1),
      Multimodal.synthCell(40L, x, y, 2)))
    Files.write(Paths.get(src, "f0.json"), Seq(
      line(0L, png(0L), "png"), // decodable image
      line(0L, "not a png at all".getBytes, "png"), // corrupt, same id
      line(0L, wav(0L), "wav"), // no pixel decoder, same id
      line(2L, png2, "png")) // an unrelated fresh image
      .mkString("\n").getBytes)
    val q = MediaPipeline.start(spark, src, store, ckpt,
      phashDedup = true)
    assert(q.awaitTermination(120000),
      "stream did not finish: the hash pass failed the micro-batch")
    // the good png and the wav both feature-decode (stats keeps both
    // payload rows of id 0 that decoded); the corrupt body rejects
    // from the feature pass; the wav ALSO rejects from the hash pass
    // (no pixel decoder) without killing the batch
    val stats = MediaPipeline.stats(spark, store)
      .select("doc_id", "format").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(stats == Set((0L, "png"), (0L, "wav"), (2L, "png")))
    val rejects = MediaPipeline.rejects(spark, store)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("format"), r.getAs[String]("error")))
    // corrupt png body: feature-pass reject AND hash-pass reject
    // (both passes threw on it — per-pass accounting); wav payload:
    // hash-pass reject only
    assert(rejects.exists { case (id, f, e) =>
      id == 0L && f == "wav" && e.contains("no pixel decoder") })
    assert(rejects.exists { case (id, f, _) => id == 0L && f == "png" })
    // both pngs fingerprinted (distinct images -> both kept, no dups)
    assert(MediaPipeline.dups(spark, store).count() == 0)
    // replay idempotence holds through the dead-letter path too
    MediaPipeline.start(spark, src, store, ckpt, phashDedup = true)
      .awaitTermination(120000)
    assert(MediaPipeline.stats(spark, store).count() == 3)
  }

  test("phash dedup tier: a decoded wav sharing a duplicated wire " +
      "doc_id with a perceptual-dup image keeps its stats row " +
      "(dup exclusion is by doc_id AND format)") {
    // review-caught: the stats anti-join on doc_id alone silently
    // dropped the wav's legitimate stats row when its id's png
    // routed to the dups delta
    val store = tmpDir("mediadupwav-store")
    def pngOf(k: Long) = Base64.getEncoder.encodeToString(
      Multimodal.pngBytes(8, 4, (x, y) => Multimodal.packRgb(
        Multimodal.synthCell(k, x, y, 0),
        Multimodal.synthCell(k, x, y, 1),
        Multimodal.synthCell(k, x, y, 2))))
    import org.apache.spark.sql.functions.col
    // batch 0 plants image k=0's fingerprint in the phash store
    MediaPipeline.ingestBatch(
      Seq((10L, pngOf(0L), "png")).toDF("doc_id", "media_b64", "format"),
      store, batchId = 0L, phashDedup = true)
    // batch 1: id 0 carries BOTH a dup png (same image as doc 10)
    // and a valid wav — the png must dup, the wav must stay in stats
    MediaPipeline.ingestBatch(
      Seq(
        (0L, pngOf(0L), "png"),
        (0L, Base64.getEncoder.encodeToString(wav(0L)), "wav"))
        .toDF("doc_id", "media_b64", "format"),
      store, batchId = 1L, phashDedup = true)
    val stats = MediaPipeline.stats(spark, store)
      .select("doc_id", "format").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(stats == Set((10L, "png"), (0L, "wav")),
      s"wav stats row must survive the dup exclusion, got $stats")
    val dups = MediaPipeline.dups(spark, store)
      .select("doc_id", "format").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(dups == Set((0L, "png")))
  }

  test("the dedup tier fingerprints AUDIO too: a half-gain re-encode " +
      "routes to the dups delta against its original (every payload " +
      "byte differs); a distinct signal stays fresh") {
    val store = tmpDir("mediadupaudio-store")
    def gainWav(base: Long, half: Boolean): String = {
      val samples = Array.tabulate(264) { i =>
        val t = Multimodal.synthAudioCell(base, i)
        (128 + (if (half) t else 2 * t)).toByte
      }
      Base64.getEncoder.encodeToString(
        Multimodal.wavBytes(8000, samples))
    }
    // batch 0: the original (full gain) plants its afp in the store
    MediaPipeline.ingestBatch(
      Seq((0L, gainWav(0L, half = false), "wav"))
        .toDF("doc_id", "media_b64", "format"),
      store, batchId = 0L, phashDedup = true)
    // batch 1: the volume-normalized re-encode must dup cross-batch;
    // an unrelated signal must stay fresh
    MediaPipeline.ingestBatch(
      Seq((1L, gainWav(0L, half = true), "wav"),
          (2L, gainWav(2L, half = false), "wav"))
        .toDF("doc_id", "media_b64", "format"),
      store, batchId = 1L, phashDedup = true)
    val kept = MediaPipeline.stats(spark, store)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L),
      s"original + distinct signal must keep their stats rows: $kept")
    val dups = MediaPipeline.dups(spark, store).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("phash"))
      .toMap
    assert(dups.keySet == Set(1L))
    assert(dups(1L).startsWith("afp:"),
      "the audio fingerprint namespace must be modality-tagged")
  }

  test("a VALID 16-bit wav outside the fingerprintable regime " +
      "passes as fresh — stats row kept, NO reject row (good audio " +
      "must never hit the corrupt-payload sink)") {
    val store = tmpDir("media16bit-store")
    val w = Multimodal.wavBytes(8000, Array.fill(16)(130.toByte))
    w(46) = 16 // bits-per-sample field inside 'fmt '
    MediaPipeline.ingestBatch(
      Seq((5L, Base64.getEncoder.encodeToString(w), "wav"))
        .toDF("doc_id", "media_b64", "format"),
      store, batchId = 0L, phashDedup = true)
    assert(MediaPipeline.stats(spark, store)
      .select("doc_id").as[Long].collect().toSet == Set(5L))
    assert(MediaPipeline.rejects(spark, store).count() == 0,
      "a decodable 16-bit wav must not dead-letter")
    assert(MediaPipeline.dups(spark, store).count() == 0)
  }

  test("phash dedup tier covers the JPEG modality: jpeg rows " +
      "fingerprint through the shared pixel path, and a re-sent " +
      "identical jpeg routes to the dups delta") {
    val src = tmpDir("mediajpeg-src")
    val store = tmpDir("mediajpeg-store")
    val ckpt = tmpDir("mediajpeg-ckpt")
    val jpeg = Multimodal.jpegBytes(32, 16, (x, y) => Multimodal.packRgb(
      Multimodal.jpegSynthChannel(3L, x, y, 0),
      Multimodal.jpegSynthChannel(3L, x, y, 1),
      Multimodal.jpegSynthChannel(3L, x, y, 2)))
    val other = Multimodal.jpegBytes(32, 16, (x, y) => Multimodal.packRgb(
      Multimodal.jpegSynthChannel(9L, x, y, 0),
      Multimodal.jpegSynthChannel(9L, x, y, 1),
      Multimodal.jpegSynthChannel(9L, x, y, 2)))
    Files.write(Paths.get(src, "f0.json"), Seq(
      line(0L, jpeg, "jpeg"),
      line(1L, jpeg, "jpg"), // identical bytes, alternate tag -> dup
      line(2L, other, "jpeg")) // distinct image -> kept
      .mkString("\n").getBytes)
    MediaPipeline.start(spark, src, store, ckpt, phashDedup = true)
      .awaitTermination(120000)
    assert(MediaPipeline.stats(spark, store)
      .select("doc_id").as[Long].collect().toSet == Set(0L, 2L))
    assert(MediaPipeline.dups(spark, store)
      .select("doc_id").as[Long].collect().toSeq == Seq(1L))
  }

  test("an empty store reads as empty frames, not a schema error") {
    val store = tmpDir("media-empty")
    assert(MediaPipeline.stats(spark, store).count() == 0)
    assert(MediaPipeline.rejects(spark, store).count() == 0)
  }
}
