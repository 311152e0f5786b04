package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the batch funnel: agreement with an
  * in-memory reference fold of the earliest-anchor greedy semantics on
  * random inputs, and window monotonicity (a wider window can only
  * raise a user's level — each step's candidate set is a superset, so
  * every greedy min lands at-or-earlier).
  */
object FunnelProps extends Properties("Funnel") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("FunnelProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val steps = Seq("a", "b", "c")

  // (user, ts, type): tight ts range so same-ts ties and out-of-window
  // chains both occur; type "d" is funnel-irrelevant noise
  private val eventsGen: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(1, 80)
    us <- Gen.listOfN(n, Gen.choose(0L, 5L))
    ts <- Gen.listOfN(n, Gen.choose(0L, 1000L))
    ty <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d"))
  } yield us.lazyZip(ts).lazyZip(ty).toList

  /** Reference: greedy earliest-anchor chain straight from the
    * definition — anchor = min step-1 ts; each later step takes the
    * min ts strictly after the previous step and within the window of
    * the anchor. */
  private def refLevels(evs: List[(Long, Long, String)],
      window: Long): Map[Long, Int] = {
    val byUser = evs.groupBy(_._1)
    byUser.map { case (u, rows) =>
      val anchors = rows.filter(_._3 == steps.head).map(_._2)
      if (anchors.isEmpty) u -> 0
      else {
        val anchor = anchors.min
        var prev = anchor
        var level = 1
        var stuck = false
        steps.tail.foreach { st =>
          if (!stuck) {
            val cand = rows.filter(r => r._3 == st && r._2 > prev &&
              r._2 <= anchor + window).map(_._2)
            if (cand.isEmpty) stuck = true
            else { prev = cand.min; level += 1 }
          }
        }
        u -> level
      }
    }
  }

  private def sparkLevels(evs: List[(Long, Long, String)],
      window: Long): Map[Long, Int] = {
    import spark.implicits._
    val df = evs.toDF("u", "ts", "ty")
    Funnel.userLevels(df, col("u"), col("ts"),
        steps.map(st => col("ty") === lit(st)), windowUs = window)
      .as[(Long, Int)].collect().toMap
  }

  property("userLevels matches the in-memory greedy fold") =
    Prop.forAll(eventsGen, Gen.choose(50L, 600L)) { (evs, w) =>
      evs.isEmpty || sparkLevels(evs, w) == refLevels(evs, w)
    }

  private def sparkLevelsFold(evs: List[(Long, Long, String)],
      window: Long): Map[Long, Int] = {
    import spark.implicits._
    val df = evs.toDF("u", "ts", "ty")
    Funnel.userLevelsFold(df, col("u"), col("ts"),
        steps.map(st => col("ty") === lit(st)), windowUs = window)
      .as[(Long, Int)].collect().toMap
  }

  property("userLevelsFold (default mode) == userLevels == reference") =
    Prop.forAll(eventsGen, Gen.choose(50L, 600L)) { (evs, w) =>
      evs.isEmpty || sparkLevelsFold(evs, w) == refLevels(evs, w)
    }

  property("wider window never lowers a level") =
    Prop.forAll(eventsGen, Gen.choose(50L, 400L)) { (evs, w) =>
      val narrow = refLevels(evs, w)
      val wide = refLevels(evs, 2 * w)
      narrow.forall { case (u, lvl) => wide(u) >= lvl }
    }
}
