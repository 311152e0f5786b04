package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the semantics of Sessionize / AsOfJoin / RangeJoin on small
  * hand-checked inputs, and checks the scale-shaped implementations
  * against their naive formulations on the events testdata.
  */
class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gap, keeps within-gap runs together") {
    val df = Seq(
      // user 1: 3 events within gaps, then a 31-min gap -> 2 sessions
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (1L, 2L, ts("2026-01-01 10:10:00")),
      (1L, 3L, ts("2026-01-01 10:39:00")),
      (1L, 4L, ts("2026-01-01 11:10:00")),
      // user 2: single event
      (2L, 5L, ts("2026-01-01 09:00:00"))
    ).toDF("user_id", "event_id", "t")
    val out = Sessionize.assign(df, col("user_id"), col("t"),
        col("event_id"), gapSec = 1800L)
      .select("event_id", "session_seq").as[(Long, Long)]
      .collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("sessionize: exact-gap boundary stays in the same session") {
    val df = Seq(
      (1L, 1L, ts("2026-01-01 10:00:00")),
      (1L, 2L, ts("2026-01-01 10:30:00")) // exactly gapSec apart
    ).toDF("user_id", "event_id", "t")
    val sess = Sessionize.sessions(df, col("user_id"), col("t"),
      col("event_id"), gapSec = 1800L)
    assert(sess.count() == 1)
    assert(sess.select("n_events").as[Long].head() == 2L)
  }

  test("asof join picks latest at-or-before, ties by tie-breaker") {
    val quotes = Seq(
      (1L, 100L, 10L, 1.0), (1L, 200L, 11L, 2.0),
      (1L, 200L, 12L, 3.0), // same time as 11 -> higher tie wins
      (2L, 500L, 13L, 9.0)
    ).toDF("k", "qt", "qid", "px")
    val trades = Seq(
      (1L, 150L, 1L), // between quotes 10 and 11 -> 10
      (1L, 200L, 2L), // same instant as quotes 11/12 -> 12 (tie)
      (1L, 50L, 3L),  // before any quote -> null
      (2L, 600L, 4L), // after quote 13 -> 13
      (3L, 100L, 5L)  // key with no quotes -> null
    ).toDF("k", "tt", "tid")
    val out = AsOfJoin.joinAsOf(trades, quotes, key = "k",
        leftTime = "tt", rightTime = "qt",
        leftTie = "tid", rightTie = "qid")
      .select(col("tid"), col("asof.qid"))
      .as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> Some(10L), 2L -> Some(12L), 3L -> None,
      4L -> Some(13L), 5L -> None))
  }

  test("asof join: NULL keys never match (SQL equi-join semantics)") {
    val quotes = Seq((Option.empty[Long], 100L, 10L),
      (Option(1L), 100L, 11L)).toDF("k", "qt", "qid")
    val trades = Seq((Option.empty[Long], 200L, 1L),
      (Option(1L), 200L, 2L)).toDF("k", "tt", "tid")
    val out = AsOfJoin.joinAsOf(trades, quotes, "k", "tt", "qt",
        "tid", "qid")
      .select(col("tid"), col("asof.qid"))
      .as[(Long, Option[Long])].collect().toMap
    // the null-keyed trade stays (LEFT semantics) but matches nothing
    assert(out == Map(1L -> None, 2L -> Some(11L)))
  }

  test("asof join equals naive range formulation on events data") {
    val ev = graft.Tables.events(spark, sf0001)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pid"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("cid"), col("user_id"),
        unix_micros(col("ts")).as("c_us"))
    val merged = AsOfJoin.joinAsOf(purchases, clicks, "user_id",
        "p_us", "c_us", "pid", "cid")
      .select(col("pid"), col("asof.cid").as("cid"))
    // naive: all earlier-or-equal clicks, keep the (c_us, cid)-max one
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pid"))
      .orderBy(col("c_us").desc_nulls_last, col("cid").desc_nulls_last)
    val naive = purchases.join(clicks.withColumnRenamed("user_id", "cu"),
        col("user_id") === col("cu") && col("c_us") <= col("p_us"),
        "left_outer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("pid"), col("cid"))
    assert(merged.exceptAll(naive).isEmpty && naive.exceptAll(merged).isEmpty)
  }

  test("bucketed range join equals naive BETWEEN join, incl. overlap") {
    val points = spark.range(0, 1000)
      .select(col("id").as("pid"), (col("id") % 97 * 1.37).as("x"))
    val rnd = new scala.util.Random(7)
    val intervals = (0 until 40).map { i =>
      val lo = rnd.nextDouble() * 120
      (s"iv$i", lo, lo + 0.5 + rnd.nextDouble() * 25) // varied widths
    }.toDF("iv", "lo", "hi")
    val bucketed = RangeJoin.pointInInterval(points, "x",
      intervals, "lo", "hi", bucketWidth = 5.0)
      .select("pid", "iv")
    val naive = points.join(intervals,
        col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iv")
    assert(bucketed.exceptAll(naive).isEmpty &&
      naive.exceptAll(bucketed).isEmpty)
    // overlap really occurs (points matching >1 interval)
    assert(naive.groupBy("pid").count().filter(col("count") > 1)
      .count() > 0)
  }

  test("range join boundary semantics: lo inclusive, hi exclusive") {
    val points = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "x")
    val iv = Seq(("a", 10.0, 20.0)).toDF("iv", "lo", "hi")
    val out = RangeJoin.pointInInterval(points, "x", iv, "lo", "hi", 7.0)
      .select("pid").as[Long].collect().toSeq
    assert(out == Seq(1L))
  }
}
