package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the bounded-state aggregates DetSample
  * and UniqUpTo: exactness in the covered regime and invariance to
  * partitioning (hence merge order) must hold for ANY input.
  */
object BoundedAggProps extends Properties("BoundedAggs") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("BoundedAggProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10) // Spark-backed cases are ~1s each

  private val valsGen =
    Gen.listOfN(120, Gen.choose(-1000, 1000).map(_.toDouble))

  private def sample(xs: List[Double], k: Int, parts: Int): Seq[Double] = {
    import spark.implicits._
    val df = spark.sparkContext
      .parallelize(xs.zipWithIndex.map(p => (p._1, p._2.toLong)), parts)
      .toDF("v", "id")
    df.agg(DetSample.sampleAgg(col("v"), k, col("id")).as("s"))
      .collect().head.getSeq[Double](0)
  }

  property("DetSample: k >= n returns the full multiset") =
    Prop.forAll(valsGen, Gen.choose(1, 5)) { (xs, parts) =>
      xs.nonEmpty ==> {
        sample(xs, xs.length + 1, parts).sorted == xs.sorted
      }
    }

  property("DetSample: partition-invariant below capacity, subset of input") =
    Prop.forAll(valsGen, Gen.choose(2, 5)) { (xs, parts) =>
      (xs.length > 20) ==> {
        val a = sample(xs, 10, 1)
        val b = sample(xs, 10, parts)
        val multiset = xs.groupBy(identity).map { case (k, v) => k -> v.size }
        val inInput = a.groupBy(identity)
          .forall { case (v, occ) => multiset.getOrElse(v, 0) >= occ.size }
        a == b && a.size == 10 && inInput
      }
    }

  property("UniqUpTo == least(countDistinct, n+1) for any partitioning") =
    Prop.forAll(Gen.listOfN(200, Gen.choose(0L, 30L)),
      Gen.choose(1, 8), Gen.choose(1, 5)) { (xs, n, parts) =>
      xs.nonEmpty ==> {
        import spark.implicits._
        val df = spark.sparkContext.parallelize(xs, parts).toDF("v")
        val got = df.agg(UniqUpTo.uniqUpTo(col("v"), n).as("u"))
          .collect().head.getLong(0)
        got == math.min(xs.distinct.size, n + 1).toLong
      }
    }
}
