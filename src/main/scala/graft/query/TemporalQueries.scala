package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{AsOfJoin, RangeJoin, Sessionize}

/** Temporal operator surface over the events stream: gap-based
  * sessionization, as-of join, interval (range) join — each backed by a
  * scale-shaped implementation in `graft.ops` and oracle-paired against
  * a plain-SQL DuckDB formulation of the same semantics.
  */
object TemporalQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 30-minute-gap user sessions: one shuffle on user_id (Sessionize),
    // per-session bounds/volume rollup on the same key.
    "session_gap" -> ((s, d) =>
      Sessionize.sessions(Tables.events(s, d), col("user_id"),
          col("ts"), col("event_id"), gapSec = 1800L)
        .withColumnRenamed("session_seq", "session_id")
        .select(col("user_id"), col("session_id"), col("n_events"),
          col("start_us"), col("end_us"), col("dur_us"))
        .orderBy(col("user_id"), col("session_id"))),

    // The same sessions via Spark's NATIVE session_window operator —
    // the built-in gap window (kept alongside ops.Sessionize, which
    // also yields per-row session ids the rollup form cannot).
    // Boundary semantics differ from Sessionize deliberately: a gap of
    // exactly 30 min starts a NEW session here (window end is
    // last_event + gap, exclusive), and the emitted end is that
    // deadline, not the last event time — the oracle encodes both.
    "session_window_native" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"), col("n_events"))
        .orderBy(col("user_id"), col("start_us"))),

    // For every purchase, the user's most recent click at-or-before it
    // (attribution shape). AsOfJoin = union-merge, single shuffle on
    // user_id — not a pairwise range join.
    "join_asof_prev_click" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          unix_micros(col("ts")).as("c_us"))
      AsOfJoin.joinAsOf(purchases, clicks, key = "user_id",
          leftTime = "p_us", rightTime = "c_us",
          leftTie = "purchase_id", rightTie = "click_id")
        .select(col("user_id"), col("purchase_id"), col("p_us"),
          coalesce(col("asof.click_id"), lit(-1L)).as("click_id"),
          coalesce(col("asof.c_us"), lit(-1L)).as("c_us"),
          coalesce(col("p_us") - col("asof.c_us"), lit(-1L))
            .as("wait_us"))
        .orderBy(col("purchase_id"))
    }),

    // Parts priced into overlapping marketing bands — interval join via
    // the bucketed equi-join formulation (bands are literal on both
    // sides; overlap makes some parts land in two bands).
    "range_join_price_bands" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("econ", 900.0, 921.0), ("value", 918.0, 942.0),
        ("mid", 942.0, 967.5), ("plus", 960.0, 985.0),
        ("prime", 985.0, 1000.5)).toDF("band", "lo", "hi")
      RangeJoin.pointInInterval(
          Tables.part(s, d).select(col("p_partkey"),
            col("p_retailprice")),
          "p_retailprice", bands, "lo", "hi", bucketWidth = 10.0)
        .select(col("p_partkey"), col("band"), col("p_retailprice"))
        .orderBy(col("p_partkey"), col("band"))
    }),

    // ClickHouse deltaSum analog: per user, the sum of POSITIVE value
    // deltas in event-time order — monotonic-counter accumulation that
    // ignores resets (negative deltas). One window over the same
    // (user, time, id) ordering the rest of the temporal surface uses,
    // then a conditional sum; deltas subtract RAW stored doubles, so
    // both engines compute bit-identical differences.
    "agg_delta_sum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .withColumn("dv", col("value") - lag(col("value"), 1).over(w))
        .groupBy(col("user_id"))
        .agg(coalesce(round(sum(when(col("dv") > 0, col("dv"))), 2),
            lit(0.0)).as("delta_sum"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Peak concurrent active sessions + union-covered active time per
    // day (ClickHouse maxIntersections / intervalLengthSum analogs;
    // see ops/Intervals). "Active" = session span plus the 30-min gap
    // timeout (a user counts until the session would expire); a day is
    // the integer epoch-day of the session start — pure integer
    // arithmetic on both engines, no timezone seam.
    "interval_concurrency" -> ((s, d) => {
      val sess = Sessionize.sessions(Tables.events(s, d), col("user_id"),
          col("ts"), col("event_id"), gapSec = 1800L)
        .select(col("start_us"),
          (col("end_us") + lit(1800L * 1000000L)).as("active_end_us"))
        .withColumn("day_num", expr("start_us DIV 86400000000"))
      graft.ops.Intervals.sweep(sess, Seq("day_num"), col("start_us"),
          col("active_end_us"))
        .orderBy(col("day_num"))
    })
  )

  val oracles: Map[String, String] = Map(
    "session_gap" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM t WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS session_id FROM f)
        |SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
        |  count(*) AS n_events, min(ts_us) AS start_us,
        |  max(ts_us) AS end_us, max(ts_us) - min(ts_us) AS dur_us
        |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "session_window_native" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w >= 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM t WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS sid FROM f)
        |SELECT user_id, min(ts_us) AS start_us,
        |  max(ts_us) + 1800000000 AS end_us, count(*) AS n_events
        |FROM s GROUP BY user_id, sid ORDER BY user_id, start_us""".stripMargin,
    "join_asof_prev_click" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS c_us
        |  FROM events WHERE event_type = 'click')
        |SELECT p.user_id, purchase_id, p_us,
        |  coalesce(click_id, -1) AS click_id,
        |  coalesce(c.c_us, -1) AS c_us,
        |  coalesce(p_us - c.c_us, -1) AS wait_us
        |FROM p LEFT JOIN c
        |  ON p.user_id = c.user_id AND c.c_us <= p.p_us
        |QUALIFY row_number() OVER (PARTITION BY purchase_id
        |  ORDER BY c.c_us DESC, click_id DESC) = 1
        |ORDER BY purchase_id""".stripMargin,
    "range_join_price_bands" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('econ', 900.0, 921.0), ('value', 918.0, 942.0),
        |  ('mid', 942.0, 967.5), ('plus', 960.0, 985.0),
        |  ('prime', 985.0, 1000.5))
        |SELECT p_partkey, band, p_retailprice
        |FROM part JOIN bands
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |ORDER BY p_partkey, band""".stripMargin,
    "agg_delta_sum" ->
      """WITH t AS (SELECT user_id, event_id, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |d AS (SELECT user_id,
        |    value - lag(value) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS dv
        |  FROM t)
        |SELECT user_id,
        |  coalesce(round(sum(CASE WHEN dv > 0 THEN dv END), 2), 0.0)
        |    AS delta_sum,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM d GROUP BY 1 ORDER BY 1""".stripMargin,
    "interval_concurrency" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |f AS (SELECT user_id, ts_us, event_id,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |      OR ts_us - lag(ts_us) OVER w > 1800000000
        |      THEN 1 ELSE 0 END AS is_new
        |  FROM t WINDOW w AS (PARTITION BY user_id
        |    ORDER BY ts_us, event_id)),
        |s AS (SELECT user_id, ts_us,
        |    sum(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING)
        |      AS session_id FROM f),
        |sess AS (SELECT min(ts_us) AS start_us,
        |    max(ts_us) + 1800000000 AS aend
        |  FROM s GROUP BY user_id, session_id),
        |iv AS (SELECT start_us // 86400000000 AS day_num, start_us,
        |    aend FROM sess WHERE start_us < aend),
        |b AS (SELECT day_num, start_us AS ts, 1 AS delta FROM iv
        |  UNION ALL SELECT day_num, aend, -1 FROM iv),
        |r AS (SELECT day_num, ts, delta,
        |    sum(delta) OVER (PARTITION BY day_num ORDER BY ts, delta
        |      ROWS UNBOUNDED PRECEDING) AS open_after,
        |    coalesce(lead(ts) OVER (PARTITION BY day_num
        |      ORDER BY ts, delta) - ts, 0) AS seg_us
        |  FROM b)
        |SELECT day_num, CAST(max(open_after) AS BIGINT) AS peak_open,
        |  CAST(sum(CASE WHEN open_after > 0 THEN seg_us ELSE 0 END)
        |    AS BIGINT) AS covered_us
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
