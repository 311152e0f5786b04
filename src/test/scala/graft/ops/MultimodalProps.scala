package graft.ops

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the perceptual-media fingerprints —
  * JVM-local (no Spark session): the claims are about the pure
  * fingerprint arithmetic, so the properties exercise it directly on
  * randomized signals instead of sampling a handful of hand cases.
  */
object MultimodalProps extends Properties("Multimodal") {

  /** Random even-centered 8-bit mono signals: centered samples are
    * 2t for t in [-64, 63], so the half-gain copy (centered t) is
    * EXACT — the regime [[Multimodal.synthAudioFpTable]] plants. Any
    * length from degenerate (no full frame) to beyond the 64-frame
    * fingerprint cap. */
  private val signalGen: Gen[Array[Int]] = for {
    n <- Gen.choose(0, 600)
    ts <- Gen.listOfN(n, Gen.choose(-64, 63))
  } yield ts.toArray

  private def wavOf(id: Long, centered: Array[Int]) =
    Multimodal.MediaRecord(id,
      Multimodal.wavBytes(8000, centered.map(c => (128 + c).toByte)),
      "wav")

  property("gain invariance: fp(signal) == fp(signal at half gain) " +
      "for ANY even-centered signal, not just the planted corpus") =
    Prop.forAll(signalGen) { ts =>
      val full = ts.map(_ * 2)
      val fpFull = Multimodal.audioFingerprint(wavOf(0L, full))
      val fpHalf = Multimodal.audioFingerprint(wavOf(1L, ts))
      fpFull == fpHalf
    }

  property("fingerprint range: never negative (the sign position " +
      "stays clear — the BIGINT-parity contract; at most 63 " +
      "comparison bits, so bit 63 is unreachable)") =
    Prop.forAll(signalGen) { ts =>
      Multimodal.audioFingerprint(wavOf(2L, ts.map(_ * 2))) >= 0L
    }

  property("frame-count truncation: appending samples beyond the " +
      "64-frame cap never changes the fingerprint") = {
    val capLen =
      Multimodal.AudioFpMaxFrames * Multimodal.AudioFpFrameLen
    Prop.forAll(Gen.listOfN(capLen, Gen.choose(-64, 63)), signalGen) {
      (ts, extra) =>
        val base = ts.toArray
        Multimodal.audioFingerprint(wavOf(3L, base.map(_ * 2))) ==
          Multimodal.audioFingerprint(
            wavOf(4L, (base ++ extra).map(_ * 2)))
    }
  }
}
