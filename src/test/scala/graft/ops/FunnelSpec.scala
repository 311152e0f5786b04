package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the funnel/retention semantics the oracle SQL encodes:
  * earliest-anchor greedy chains, strict ordering, window from the
  * anchor, exact-day retention offsets.
  */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in micros
  private val steps = Seq(col("t") === "view", col("t") === "click",
    col("t") === "purchase")

  private def levels(rows: (Long, String, Long)*): Map[Long, Int] = {
    val ev = rows.toSeq.toDF("u", "t", "us")
    Funnel.userLevels(ev, col("u"), col("us"), steps, windowUs = 24 * H)
      .as[(Long, Int)].collect().toMap
  }

  test("complete chain in window reaches level 3") {
    assert(levels((1L, "view", 0L), (1L, "click", H), (1L, "purchase", 2 * H))
      === Map(1L -> 3))
  }

  test("step outside the anchor window does not count") {
    // click lands 25h after the anchoring view
    assert(levels((1L, "view", 0L), (1L, "click", 25 * H)) === Map(1L -> 1))
    // click in window, purchase at 30h out of it -> level 2
    assert(levels((2L, "view", 0L), (2L, "click", H),
      (2L, "purchase", 30 * H)) === Map(2L -> 2))
  }

  test("order is strict: earlier steps can't reuse later-step events") {
    // click/purchase BEFORE the first view -> only level 1
    assert(levels((1L, "click", 0L), (1L, "purchase", H),
      (1L, "view", 2 * H)) === Map(1L -> 1))
    // same-timestamp click does not satisfy strictly-after
    assert(levels((2L, "view", 0L), (2L, "click", 0L)) === Map(2L -> 1))
  }

  test("no step-1 event means level 0; greedy anchor is the earliest view") {
    assert(levels((1L, "purchase", 0L)) === Map(1L -> 0))
    // anchor = view@0 (not view@22h): purchase@25h is outside ITS window
    // even though a 22h anchor would admit it — greedy semantics
    assert(levels((2L, "view", 0L), (2L, "click", 23 * H),
      (2L, "view", 22 * H), (2L, "purchase", 25 * H)) === Map(2L -> 2))
  }

  test("retention counts exact-day returns per cohort") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-02 09:00:00"),
      (1L, "2024-01-08 12:00:00"),
      (2L, "2024-01-01 23:59:59"),
      (3L, "2024-01-02 00:00:00"), (3L, "2024-01-09 08:00:00"))
      .toDF("u", "s").select(col("u"), col("s").cast("timestamp").as("ts"))
    val out = Funnel.retention(ev, col("u"), col("ts"), Seq(1, 7))
      .select(date_format(col("c_day"), "yyyy-MM-dd"), col("n_users"),
        col("d1"), col("d7"))
      .as[(String, Long, Long, Long)].collect()
      .map { case (k, a, b, c) => k -> ((a, b, c)) }.toMap
    // cohort Jan 1: users 1,2; user 1 returns on day+1 and day+7
    assert(out("2024-01-01") === ((2L, 1L, 1L)))
    // cohort Jan 2: user 3 returns on day+7 only
    assert(out("2024-01-02") === ((1L, 0L, 1L)))
  }

  test("userLevelsFold strict_order: any non-advancing event kills the chain") {
    def lv(strict: Boolean)(rows: (Long, String, Long)*): Map[Long, Int] = {
      val ev = rows.toSeq.toDF("u", "t", "us")
      Funnel.userLevelsFold(ev, col("u"), col("us"), steps,
          windowUs = 24 * H, strictOrder = strict)
        .as[(Long, Int)].collect().toMap
    }
    // clean chain: strict == default == 3
    assert(lv(strict = true)((1L, "view", 0L), (1L, "click", H),
      (1L, "purchase", 2 * H))(1L) === 3)
    // out-of-order purchase between view and click: strict kills at 1,
    // default skips it and completes
    val rows2 = Seq((2L, "view", 0L), (2L, "purchase", H),
      (2L, "click", 2 * H), (2L, "purchase", 3 * H))
    assert(lv(strict = true)(rows2: _*)(2L) === 1)
    assert(lv(strict = false)(rows2: _*)(2L) === 3)
    // non-funnel noise between steps ALSO interrupts (ClickHouse
    // strict_order: no other events allowed between chain steps) —
    // default mode ignores it
    assert(lv(strict = true)((3L, "view", 0L), (3L, "signup", H),
      (3L, "click", 2 * H))(3L) === 1)
    assert(lv(strict = false)((3L, "view", 0L), (3L, "signup", H),
      (3L, "click", 2 * H))(3L) === 2)
    // a REPEAT of an already-passed condition also interrupts
    val rows4 = Seq((4L, "view", 0L), (4L, "view", H),
      (4L, "click", 2 * H))
    assert(lv(strict = true)(rows4: _*)(4L) === 1)
    assert(lv(strict = false)(rows4: _*)(4L) === 2)
  }

  test("stepTimes: greedy chain timestamps, nulls once the chain stops") {
    val ev = Seq(
      // user 1: view@0, click@+1h, purchase@+2h -> full chain
      (1L, "view", 0L), (1L, "click", H), (1L, "purchase", 2 * H),
      // user 2: view@0, click@+1h, no purchase -> t3 null
      (2L, "view", 0L), (2L, "click", H),
      // user 3: greedy anchor = earliest view; the click BEFORE it
      // cannot count, so the chain stops at level 1
      (3L, "click", 0L), (3L, "view", H)
    ).toDF("u", "t", "us")
    val out = Funnel.stepTimes(ev, col("u"), col("us"), steps,
        windowUs = 24 * H)
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) === ((Some(0L), Some(H), Some(2 * H))))
    assert(out(2L) === ((Some(0L), Some(H), None)))
    assert(out(3L) === ((Some(H), None, None)))
    // nulls are monotone: a missing step K implies missing K+1 —
    // guaranteed by the nested reached sets; spot-check output shape.
    out.values.foreach { case (_, t2, t3) =>
      assert(!(t2.isEmpty && t3.nonEmpty))
    }
  }

  test("unigram log-likelihood matches hand computation") {
    // corpus: "a a b" + "b" -> c(a)=2, c(b)=2, N=4
    // doc 0: avg(ln 2) - ln 4 = -ln 2; doc 1: ln 2 - ln 4 = -ln 2
    val docs = Seq((0L, "a a b"), (1L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogLik(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
      .map { case (k, n, ll) => k -> ((n, ll)) }.toMap
    val expected = BigDecimal(-math.log(2)).setScale(3,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(0L) === ((3L, expected)))
    assert(out(1L) === ((1L, expected)))
  }
}
