package graft.ops

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the dedup/similarity operators: LSH never
  * misses a planted near-duplicate, exact groups partition the corpus,
  * cosine is symmetric and bounded.
  */
object DedupProps extends Properties("Dedup") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("DedupProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15) // Spark-backed cases are ~1s each

  private val word = Gen.oneOf("spark", "scan", "join", "sort", "merge",
    "filter", "group", "row", "batch", "query", "table", "key", "hash",
    "data", "fast", "slow")

  private val docGen: Gen[String] =
    Gen.listOfN(30, word).map(_.mkString(" "))

  property("LSH dedup finds a planted near-duplicate") =
    Prop.forAll(Gen.listOfN(12, docGen), Gen.choose(0, 11)) {
      (texts, dupOf) =>
        texts.nonEmpty ==> {
          import spark.implicits._
          // plant: copy one doc and perturb its last word
          val dup = texts(dupOf % texts.length) + " extra"
          val docs = (texts :+ dup).zipWithIndex
            .map { case (t, i) => (i.toLong, t) }
            .toDF("doc_id", "text")
          val pairs = Dedup.minHashDedup(docs, 3, 0.7)
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          pairs.contains(
            (dupOf.toLong % texts.length, texts.length.toLong))
        }
    }

  property("exactGroups partitions the corpus (sizes sum to |docs|)") =
    Prop.forAll(Gen.listOfN(10, docGen)) { texts =>
      texts.nonEmpty ==> {
        import spark.implicits._
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val groups = Dedup.exactGroups(docs).collect()
        groups.map(_.getLong(1)).sum == texts.length.toLong &&
          groups.forall(g => g.getLong(2) >= 0)
      }
    }

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(8, Gen.choose(-1.0f, 1.0f)).map(_.toArray)
      .suchThat(v => v.exists(math.abs(_) > 1e-3))

  property("cosine is symmetric and bounded") =
    Prop.forAll(vecGen, vecGen) { (a, b) =>
      import spark.implicits._
      import org.apache.spark.sql.functions.col
      val df = Seq((a, b)).toDF("a", "b")
      val Array(ab, ba, aa) = df.select(
        Similarity.cosine(col("a"), col("b")),
        Similarity.cosine(col("b"), col("a")),
        Similarity.cosine(col("a"), col("a"))).head() match {
        case r => Array(r.getDouble(0), r.getDouble(1), r.getDouble(2))
      }
      math.abs(ab - ba) < 1e-12 && ab <= 1.0 + 1e-9 &&
        ab >= -1.0 - 1e-9 && math.abs(aa - 1.0) < 1e-9
    }
}
