package graft.agg

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the SummingMergeTree contract
  * (kafka+clickhouse.md:396-401): partial aggregation is associative/
  * commutative under ANY partition of the input into batches, and
  * replaying a batch (at-least-once delivery) is idempotent when routed
  * through batchId-keyed appends. SURVEY.md §5.3.
  */
object RollupProps extends Properties("Rollup") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("RollupProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    // getOrCreate may CREATE the JVM-wide session for all suites —
    // keep the warehouse out of the repo like SparkSpec does
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val levels = Seq("info", "warn", "error", "debug")

  private val eventsGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(60, for {
      ts <- Gen.choose(1700000000L, 1700000000L + 10 * 86400L)
      lvl <- Gen.oneOf(levels)
    } yield (ts, lvl, "m"))

  private val splitsGen: Gen[List[Int]] =
    Gen.listOfN(3, Gen.choose(1, 58))

  private def totals(rows: Seq[(Long, String, String)],
      cuts: Seq[Int]): Map[String, Long] = {
    import spark.implicits._
    val sorted = cuts.filter(_ < rows.length).distinct.sorted
    val bounds = (0 +: sorted :+ rows.length).distinct.sorted
    val batches = bounds.sliding(2).map {
      case Seq(a, b) => rows.slice(a, b)
    }.filter(_.nonEmpty).toSeq
    val partials = batches
      .map(b => DailyRollup.fromQueue(
        b.toDF("timestamp", "level", "message")))
      .reduce(_ union _)
    DailyRollup.levelTotals(partials).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  property("split/re-sum equals direct aggregation for any batch cuts") =
    Prop.forAll(eventsGen, splitsGen) { (rows, cuts) =>
      rows.nonEmpty ==> {
        import spark.implicits._
        val direct = DailyRollup.levelTotals(DailyRollup.fromQueue(
          rows.toDF("timestamp", "level", "message")))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        totals(rows, cuts) == direct
      }
    }

  property("level totals sum to the event count") =
    Prop.forAll(eventsGen) { rows =>
      rows.nonEmpty ==> {
        import spark.implicits._
        val t = DailyRollup.levelTotals(DailyRollup.fromQueue(
          rows.toDF("timestamp", "level", "message")))
          .collect().map(_.getLong(1)).sum
        t == rows.length.toLong
      }
    }
}
