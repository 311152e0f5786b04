package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the SpaceSaving heavy-hitters aggregate
  * and the bloom-prefiltered semi join — both must hold for ANY input
  * and ANY partitioning/merge order (the merge is trimmed, hence not
  * associative; only order-robust bounds are lawful properties).
  */
object TopKProps extends Properties("TopKBloom") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("TopKProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10) // Spark-backed cases are ~1s each

  private val item = Gen.choose(0, 25).map(i => s"w$i")
  private val streamGen = Gen.listOfN(300, item)

  property("SpaceSaving bounds: never under, over by at most err_max") =
    Prop.forAll(streamGen, Gen.choose(4, 32), Gen.choose(1, 6)) {
      (stream, capacity, parts) =>
        stream.nonEmpty ==> {
          import spark.implicits._
          val truth = stream.groupBy(identity)
            .map { case (k, v) => k -> v.size.toLong }
          val df = spark.sparkContext.parallelize(stream, parts)
            .toDF("token")
          val out = TopK.topK(df, col("token"), k = stream.length,
              capacity = capacity)
            .collect().map(r =>
              (r.getString(0), r.getLong(1), r.getLong(2)))
          out.forall { case (term, est, err) =>
            val t = truth(term)
            est >= t && est - err <= t
          }
        }
    }

  property("SpaceSaving is exact when capacity covers the domain") =
    Prop.forAll(streamGen, Gen.choose(1, 6)) { (stream, parts) =>
      stream.nonEmpty ==> {
        import spark.implicits._
        val truth = stream.groupBy(identity)
          .map { case (k, v) => k -> v.size.toLong }
        val df = spark.sparkContext.parallelize(stream, parts)
          .toDF("token")
        val out = TopK.topK(df, col("token"), k = stream.length,
            capacity = 64) // > 26 possible items
          .collect().map(r =>
            (r.getString(0), r.getLong(1), r.getLong(2)))
        out.map { case (t, c, _) => t -> c }.toMap == truth &&
          out.forall(_._3 == 0L)
      }
    }

  property("bloom-pruned semi join == plain semi join") =
    Prop.forAll(Gen.listOfN(60, Gen.choose(0L, 40L)),
      Gen.listOfN(12, Gen.choose(0L, 40L))) { (factKeys, dimKeys) =>
      (factKeys.nonEmpty && dimKeys.nonEmpty) ==> {
        import spark.implicits._
        val fact = factKeys.toDF("k")
        val dim = dimKeys.toDF("dk")
        val got = BloomPrune.semiJoin(fact, col("k"), dim, "dk")
          .as[Long].collect().sorted.toSeq
        val want = fact.join(dim, col("k") === col("dk"), "left_semi")
          .as[Long].collect().sorted.toSeq
        got == want
      }
    }
}
