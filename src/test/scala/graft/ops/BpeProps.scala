package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the BPE trainer + encoder (round-11
  * verdict #6) — the contracts BpeSpec pins on hand tables, proven
  * here over randomized Zipf-ish corpora:
  *
  *  (a) losslessness: encode(word) concatenates back to the word under
  *      ANY trained table (merges only ever join adjacent symbols);
  *  (b) monotonicity: total token count is non-increasing in
  *      numMerges (each extra merge can only join, never split);
  *  (c) partition invariance: training on a repartitioned corpus
  *      yields the IDENTICAL merge table — the determinism contract
  *      Bpe.scala's header claims, previously proven only for the
  *      histogram path.
  *
  * (a) and (b) are driver-pure (no Spark) so they run at full
  * ScalaCheck volume; (c) is Spark-backed and volume-capped like the
  * other Spark props suites.
  */
object BpeProps extends Properties("Bpe") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("BpeProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  // Zipf-ish corpus: a small alphabet makes pair collisions (the
  // interesting merge dynamics) likely; geometric-ish word counts
  // make some words dominate like real text.
  private val word: Gen[String] =
    Gen.choose(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.choose('a', 'd')).map(_.mkString))
  private val histGen: Gen[List[(String, Long)]] =
    Gen.choose(1, 30).flatMap(k =>
      Gen.listOfN(k, Gen.zip(word, Gen.choose(1L, 50L))))

  property("losslessness: subwords concatenate back to the word " +
      "under any trained table") =
    Prop.forAll(histGen, Gen.choose(0, 40), word) { (hist, m, probe) =>
      val merges = Bpe.train(hist, m)
      val words = probe :: hist.map(_._1)
      words.forall(w => merges.encodeWord(w).mkString == w)
    }

  property("monotonicity: token count is non-increasing in numMerges") =
    Prop.forAll(histGen, Gen.choose(0, 20), word) { (hist, m, probe) =>
      val fewer = Bpe.train(hist, m)
      val more = Bpe.train(hist, m + 5)
      val words = probe :: hist.map(_._1)
      // more merges = the same table plus extra ranks (training is a
      // deterministic greedy prefix), so counts can only shrink
      words.forall(w =>
        more.countWord(w) <= fewer.countWord(w)) &&
        (more.pairs.take(fewer.pairs.length).toSeq ==
          fewer.pairs.toSeq) // prefix property, the reason why
    }

  property("partition invariance: trainOnCorpus yields the identical " +
      "table from any repartitioning of the same corpus") = {
    import spark.implicits._
    Prop.forAll(
      Gen.choose(5, 25).flatMap(n => Gen.listOfN(n,
        Gen.choose(2, 6).flatMap(len =>
          Gen.listOfN(len, word).map(_.mkString(" "))))),
      Gen.choose(1, 5), Gen.choose(1, 5)) { (docs, p1, p2) =>
      docs.nonEmpty ==> {
        val df1 = spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }, p1)
          .toDF("doc_id", "text")
        val df2 = spark.sparkContext.parallelize(
          docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.reverse,
          p2).toDF("doc_id", "text")
        val a = Bpe.trainOnCorpus(df1, numMerges = 24, vocabCap = 64)
        val b = Bpe.trainOnCorpus(df2, numMerges = 24, vocabCap = 64)
        a.pairs.toSeq == b.pairs.toSeq
      }
    }
  }

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10) // the Spark-backed case is ~1s each
}
