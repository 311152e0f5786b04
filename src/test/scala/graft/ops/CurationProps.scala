package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the curation operators: packing always
  * tiles each shard exactly, and int8 quantization's roundtrip error
  * never exceeds its per-vector bound — over arbitrary generated
  * corpora, not just the fixtures.
  */
object CurationProps extends Properties("Curation") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("CurationProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "pi")

  private val docGen: Gen[String] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, word).map(_.mkString(" ")))

  property("packChunks tiles every shard: contiguous, complete, exact") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.oneOf("a", "b", "c"), docGen)),
      Gen.choose(4, 64)) { (docs, budget) =>
      import spark.implicits._
      val df = docs.zipWithIndex
        .map { case ((lang, text), i) => (i.toLong, lang, text) }
        .toDF("doc_id", "lang", "text")
      val rows = Curation.packChunks(df, budget)
        .orderBy("lang", "doc_id").collect()
        .map(r => (r.getString(0), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
      rows.groupBy(_._1).forall { case (_, shard) =>
        val starts = shard.map(_._3)
        val ends = shard.map(_._4)
        // begins at zero, each start is the previous end, spans n_tok,
        // chunk ids are the floor-div of the offsets
        starts.head == 0L &&
        starts.drop(1).sameElements(ends.dropRight(1)) &&
        shard.forall { case (_, n, s, e, f, l) =>
          e - s == n && f == s / budget && l == (e - 1) / budget
        }
      }
    }

  property("quantize roundtrip error <= max|x|/254 per component") =
    Prop.forAll(Gen.nonEmptyListOf(
      Gen.nonEmptyListOf(Gen.choose(-10.0f, 10.0f))
        .map(_.take(16)))) { vecs =>
      import spark.implicits._
      val df = vecs.zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
        .toDF("vec_id", "embedding")
      val back = Similarity.dequantize(Similarity.quantize(df))
        .collect().map(r =>
          r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      vecs.zipWithIndex.forall { case (v, i) =>
        val b = back(i.toLong)
        val bound = v.map(math.abs(_)).max / 254.0 + 1e-6
        v.zip(b).forall { case (x, y) => math.abs(x - y) <= bound }
      }
    }

  property("mixtureSample: never up-samples, deterministic, anchor whole") =
    Prop.forAll(
      Gen.listOfN(40, Gen.zip(Gen.oneOf("a", "b", "c"),
        Gen.choose(1, 50))),
      Gen.zip(Gen.choose(1, 8), Gen.choose(1, 8), Gen.choose(1, 8))) {
      (rows, rawT) =>
        rows.map(_._1).distinct.size == 3 ==> {
          import spark.implicits._
          val df = rows.zipWithIndex
            .map { case ((dom, w), i) => (i.toLong, dom, w.toLong) }
            .toDF("id", "dom", "w")
          val tSum = (rawT._1 + rawT._2 + rawT._3).toDouble
          val targets = Map("a" -> rawT._1 / tSum, "b" -> rawT._2 / tSum,
            "c" -> rawT._3 / tSum)
          def mix() = Sampling.mixtureSample(df, col("dom"), col("id"),
              col("w"), targets)
            .groupBy("dom").agg(sum("w").as("w")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val kept = mix()
          val full = df.groupBy("dom").agg(sum("w").as("w")).collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          val noUpsample = full.forall { case (d, w) =>
            kept.getOrElse(d, 0L) <= w }
          val anchor = targets.keys.minBy(d => full(d) / targets(d))
          (noUpsample :| "kept exceeds full") &&
          ((kept.getOrElse(anchor, 0L) == full(anchor)) :| "anchor cut") &&
          ((mix() == kept) :| "nondeterministic")
        }
    }

  property("fimSplit: cuts in [0, len], span algebra exact, " +
      "deterministic") = Prop.forAll(
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 100000L), docGen))) {
    docs =>
      import spark.implicits._
      val df = docs.distinctBy(_._1).toDF("doc_id", "text")
      def run() = Curation.fimSplit(df, col("doc_id"), col("text"))
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getString(4)))
      val rows = run()
      val lens = docs.distinctBy(_._1)
        .map { case (id, t) => id -> t.length.toLong }.toMap
      val bounds = rows.forall { case (id, c1, c2, nMid, _) =>
        0 <= c1 && c1 <= c2 && c2 <= lens(id) && nMid == c2 - c1
      }
      (bounds :| "cut bounds / span algebra") &&
      ((run().toSeq == rows.toSeq) :| "nondeterministic")
  }

  property("spanCorrupt: accounting invariants over arbitrary corpora") =
    Prop.forAll(
      Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 100000L), docGen))) {
      docs =>
        import spark.implicits._
        val df = docs.distinctBy(_._1).toDF("doc_id", "text")
        val rows = Curation.spanCorrupt(df, col("doc_id"), col("text"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getLong(3)))
        rows.forall { case (_, nTok, nSpans, nMasked) =>
          val nBlocks = (nTok + 2) / 3
          // spans are whole blocks; masked tokens tile exactly: every
          // masked block contributes 3 tokens except possibly the
          // (single) final partial block
          nSpans <= nBlocks && nMasked <= nTok &&
            nMasked >= nSpans * 3 - 2 && nMasked <= nSpans * 3
        } :| s"accounting: $rows"
    }
}
