package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** ScalaCheck properties for the temporal operators, each checked
  * against a straightforward in-memory reference implementation on
  * random inputs.
  */
object TemporalProps extends Properties("Temporal") {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("TemporalProps")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def overrideParameters(p: org.scalacheck.Test.Parameters)
      : org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  // (key, epoch-second, unique id) event triples; ts ties are common
  // on purpose (small ts range) to exercise tie-breaking
  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    ks <- Gen.listOfN(n, Gen.choose(0L, 4L))
    ts <- Gen.listOfN(n, Gen.choose(0L, 5000L))
  } yield ks.lazyZip(ts).lazyZip(0L until n.toLong).toList
    .map { case (k, t, i) => (k, t, i) }

  property("sessionize matches in-memory gap fold") =
    Prop.forAll(eventsGen, Gen.choose(60L, 1200L)) { (evs, gap) =>
      import spark.implicits._
      val df = evs.toDF("k", "sec", "id")
        .select(col("k"), timestamp_seconds(col("sec")).as("t"),
          col("id"))
      val got = Sessionize.assign(df, col("k"), col("t"), col("id"),
          gap)
        .select(col("id"), col("session_seq")).as[(Long, Long)]
        .collect().toMap
      // reference: per key, sort by (sec, id), fold gaps
      val expected = evs.groupBy(_._1).flatMap { case (_, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        var seq = 0L
        var prev = Long.MinValue
        sorted.map { case (_, sec, id) =>
          if (prev == Long.MinValue || sec - prev > gap) seq += 1
          prev = sec
          id -> seq
        }
      }
      got == expected
    }

  property("asof join matches in-memory latest-at-or-before scan") =
    Prop.forAll(eventsGen, eventsGen) { (ls, rs) =>
      (ls.nonEmpty && rs.nonEmpty) ==> {
        import spark.implicits._
        val left = ls.toDF("k", "lt", "lid")
        // right ids offset so the two sides never share an id
        val right = rs.map { case (k, t, i) => (k, t, i + 1000L) }
        val rightDf = right.toDF("k", "rt", "rid")
        val got = AsOfJoin.joinAsOf(left, rightDf, "k", "lt", "rt",
            "lid", "rid")
          .select(col("lid"), col("asof.rid"))
          .as[(Long, Option[Long])].collect().toMap
        val expected = ls.map { case (k, lt, lid) =>
          val cands = right.filter(r => r._1 == k && r._2 <= lt)
          lid -> (if (cands.isEmpty) None
                  else Some(cands.maxBy(r => (r._2, r._3))._3))
        }.toMap
        got == expected
      }
    }

  property("bucketed range join matches naive containment scan") =
    Prop.forAll(
      Gen.listOfN(40, Gen.choose(0.0, 100.0)),
      Gen.listOfN(10, Gen.zip(Gen.choose(0.0, 90.0),
        Gen.choose(0.1, 30.0))),
      Gen.choose(1.0, 20.0)) { (pts, ivs, width) =>
      import spark.implicits._
      val points = pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toDF("pid", "x")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, w), i) => (i.toLong, lo, lo + w) }
      val ivDf = intervals.toDF("iv", "lo", "hi")
      val got = RangeJoin.pointInInterval(points, "x", ivDf, "lo",
          "hi", width)
        .select(col("pid"), col("iv")).as[(Long, Long)]
        .collect().toSet
      val expected = (for {
        (pid, x) <- pts.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        (iv, lo, hi) <- intervals
        if x >= lo && x < hi
      } yield (pid, iv)).toSet
      got == expected
    }
}
