package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("decodeStub is deterministic and byte-faithful") {
    val rec = Multimodal.MediaRecord(1L, "abc".getBytes("UTF-8"), "png")
    val f1 = Multimodal.decodeStub(rec)
    val f2 = Multimodal.decodeStub(rec)
    assert(f1.n_bytes == 3 && f1.format == "png")
    assert(f1.features.toSeq == f2.features.toSeq)
    assert(f1.features(2) == 'a'.toInt && f1.features(3) == 'c'.toInt)
  }

  test("extractFeatures preserves row count and schema shape") {
    val media = Multimodal.mediaTable(Tables.documents(spark, sf0001))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() == 500)
    val row = feats.head()
    assert(row.features.length == 4)
    assert(row.n_bytes > 0)
  }

  test("empty payload is handled") {
    val f = Multimodal.decodeStub(
      Multimodal.MediaRecord(9L, Array.emptyByteArray, "wav"))
    assert(f.n_bytes == 0 && f.features.toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }
}
