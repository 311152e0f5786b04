package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the compression-ratio quality signal. The registered
  * `text_compression_ratio` query is rows-only (DEFLATE output is not
  * pinned across zlib builds), so these ORDER/RANGE properties are its
  * exactness surface: the signal must separate repetitive from natural
  * from incompressible text, deterministically, through both the
  * Column and SQL surfaces.
  */
class CompressSpec extends SparkSpec {
  import spark.implicits._

  private def ratios(texts: Seq[String]): Seq[Double] =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select(col("id"),
        CompressFunctions.deflate_ratio(col("text")).as("r"))
      .orderBy("id").collect().map(_.getDouble(1)).toSeq

  test("order properties: repetitive << natural <= near-random; " +
      "empty is 0; bounds sane") {
    val repetitive = "spam spam spam spam " * 64
    val natural = "the quick brown fox jumps over the lazy dog and " +
      "then wanders through a field of documents looking for columns " +
      "to prune while the optimizer folds constants quietly " * 4
    val rnd = new scala.util.Random(11)
    val random = (0 until 2048)
      .map(_ => (0x21 + rnd.nextInt(94)).toChar).mkString
    val Seq(rRep, rNat, rRnd, rEmpty) =
      ratios(Seq(repetitive, natural, random, ""))
    assert(rRep < rNat && rNat < rRnd,
      s"order violated: rep=$rRep nat=$rNat rnd=$rRnd")
    assert(rRep < 0.1, s"repetitive text must compress hard: $rRep")
    assert(rRnd > 0.8, s"random printable text is near-incompressible: $rRnd")
    assert(rEmpty == 0.0)
    // ratios are positive and bounded by a small constant over 1.0
    // (deflate's stored-block overhead)
    Seq(rRep, rNat, rRnd).foreach(r => assert(r > 0.0 && r < 1.2))
  }

  test("deterministic across runs and row order; SQL surface matches " +
      "the Column API") {
    val docs = Tables.documents(spark, sf0001).limit(100)
    def viaColumn = docs
      .select(col("doc_id"),
        CompressFunctions.deflate_ratio(col("text")).as("r"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val a = viaColumn
    val b = viaColumn
    assert(a.toSeq == b.toSeq)
    GraftExtensions.register(spark)
    docs.createOrReplaceTempView("cmp_docs")
    val viaSql = spark.sql(
      "SELECT doc_id, deflate_ratio(text) AS r FROM cmp_docs " +
        "ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(viaSql.toSeq == a.toSeq)
  }

  test("null text is null; single char compresses to >= 1 byte") {
    val out = Seq((1L, null.asInstanceOf[String]), (2L, "x"))
      .toDF("id", "text")
      .select(CompressFunctions.deflate_ratio(col("text")).as("r"))
      .orderBy(lit(1)).collect()
    assert(out.exists(_.isNullAt(0)))
    val single = out.filter(!_.isNullAt(0)).map(_.getDouble(0))
    assert(single.forall(_ >= 1.0)) // 1-byte input can't shrink
  }
}
