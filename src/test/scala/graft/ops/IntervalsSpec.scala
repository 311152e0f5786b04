package graft.ops

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins Intervals.sweep against hand cases and a brute-force
  * reference on seeded random interval sets.
  */
class IntervalsSpec extends SparkSpec {
  import spark.implicits._

  private def run(iv: Seq[(String, Long, Long)]): Map[String, (Long, Long)] =
    Intervals.sweep(iv.toDF("g", "s", "e"), Seq("g"), col("s"), col("e"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("hand cases: overlap, touching, containment, empty") {
    val got = run(Seq(
      // two overlapping + one disjoint: peak 2, union [0,15)+[20,30)
      ("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 30L),
      // touching intervals never overlap (half-open): peak 1
      ("b", 0L, 10L), ("b", 10L, 20L),
      // containment: peak 3 inside the innermost
      ("c", 0L, 100L), ("c", 10L, 90L), ("c", 40L, 50L),
      // empty interval dropped entirely
      ("d", 5L, 5L), ("d", 0L, 2L)))
    assert(got("a") == ((2L, 25L)))
    assert(got("b") == ((1L, 20L)))
    assert(got("c") == ((3L, 100L)))
    assert(got("d") == ((1L, 2L)))
  }

  /** Brute force: peak by sweeping all boundary points, union by
    * merging sorted intervals. */
  private def reference(iv: Seq[(Long, Long)]): (Long, Long) = {
    val live = iv.filter(p => p._1 < p._2)
    val peak = live.flatMap(p => Seq(p._1, p._2)).distinct.map { t =>
      live.count(p => p._1 <= t && t < p._2)
    }.max.toLong
    val covered = live.sortBy(identity).foldLeft((0L, Long.MinValue)) {
      case ((acc, hi), (s, e)) =>
        if (s >= hi) (acc + (e - s), e)
        else if (e > hi) (acc + (e - hi), e)
        else (acc, hi)
    }._1
    (peak, covered)
  }

  test("matches brute force on seeded random interval sets") {
    val rnd = new Random(42)
    val iv = for {
      g <- Seq("g0", "g1", "g2")
      _ <- 0 until 60
    } yield {
      val s = rnd.nextInt(500).toLong
      (g, s, s + rnd.nextInt(40).toLong) // includes empty intervals
    }
    val got = run(iv)
    for (g <- Seq("g0", "g1", "g2")) {
      val want = reference(iv.filter(_._1 == g).map(p => (p._2, p._3)))
      assert(got(g) == want, s"group $g")
    }
  }

  test("partition-invariant") {
    val rnd = new Random(7)
    val iv = Seq.fill(300)(("k", rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong + 1000L))
    val df = iv.toDF("g", "s", "e")
    val a = Intervals.sweep(df.repartition(1), Seq("g"), col("s"), col("e"))
      .collect().head
    val b = Intervals.sweep(df.repartition(13), Seq("g"), col("s"), col("e"))
      .collect().head
    assert(a.getLong(1) == b.getLong(1) && a.getLong(2) == b.getLong(2))
  }
}
