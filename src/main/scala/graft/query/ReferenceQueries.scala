package graft.query

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.agg.DailyRollup

/** The reference's complete query surface (SURVEY.md §2), expressed over
  * the `events` testdata table (the analog of its event stream — see
  * FIXTURES.md §B mapping: event_type<->level, ts<->timestamp,
  * props<->metadata, user_id<->campaign_id's key role).
  *
  * Every entry is oracle-paired: the DuckDB SQL twin lives in [[oracles]]
  * with identical aliases and a total ORDER BY so hash comparison is
  * deterministic. Sums of doubles are rounded in both systems.
  */
object ReferenceQueries {

  private def events(s: SparkSession, d: String) = Tables.events(s, d)

  /** events-domain enum map (the Enum8 name->code operator, F7, applied
    * to this table's closed 5-value domain). */
  private val eventCodes =
    Seq("click" -> 1, "error" -> 2, "purchase" -> 3, "signup" -> 4,
      "view" -> 5)

  private def eventCode(c: Column): Column =
    eventCodes.foldLeft(lit(null).cast("int")) {
      case (acc, (name, code)) =>
        when(c === lit(name), lit(code)).otherwise(acc)
    }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // E1/E3 + F1/F2 + B2/B3 — the MV query (kafka+clickhouse.md:224-229).
    // Temporal outputs are cast to string/epoch in every query here so
    // the oracle compare is representation-exact (parquet ns/us vs
    // DuckDB timestamp types would otherwise diverge).
    "mv_daily_rollup" -> ((s, d) =>
      DailyRollup.fromEvents(events(s, d))
        .select(col("day").cast("string").as("day"), col("level"),
          col("total"))
        .orderBy(col("day"), col("level"))),

    // E2/E4/E5 — partial+final split then the dashboard read
    // (kafka+clickhouse.md:240-243): rollup to partials, re-sum.
    "mv_level_totals" -> ((s, d) =>
      DailyRollup.levelTotals(DailyRollup.fromEvents(events(s, d)))
        .orderBy(col("level"))),

    // B1 + C1-C3 + G1 — the Part-1 retrieval (kafka+clickhouse.md:
    // 160-166): equality on entity key AND enum value, project, sort desc.
    "events_point_lookup" -> ((s, d) =>
      events(s, d)
        .filter(col("user_id") === lit(7) &&
          col("event_type") === lit("click"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("ts_us").desc, col("event_id"))),

    // The same retrieval phrased as parsed SQL via spark.sql — the
    // reference's users write SQL (kafka+clickhouse.md:160-166), so the
    // engine's SQL entry point is exercised verbatim-shaped: temp view
    // + SELECT/WHERE/ORDER BY string. Shares events_point_lookup's
    // oracle semantics; Catalyst compiles both to the same plan.
    "events_point_lookup_sql" -> ((s, d) => {
      events(s, d).createOrReplaceTempView("events_v")
      s.sql("""SELECT event_id, unix_micros(ts) AS ts_us
              |FROM events_v
              |WHERE user_id = 7 AND event_type = 'click'
              |ORDER BY ts_us DESC, event_id""".stripMargin)
    }),

    // F7 — Enum8 name<->code mapping over the closed domain.
    "enum_name_to_code" -> ((s, d) =>
      events(s, d)
        .groupBy(col("event_type").as("level"),
          eventCode(col("event_type")).as("code"))
        .agg(count(lit(1)).as("total"))
        .orderBy(col("level"))),

    // F3 — toYYYYMMDD partition key (kafka+clickhouse.md:102), exact
    // numeric form for partition-pruning parity.
    "partition_key_yyyymmdd" -> ((s, d) =>
      events(s, d)
        .groupBy(date_format(col("ts"), "yyyyMMdd").cast("int")
          .as("event_date"))
        .agg(count(lit(1)).as("total"))
        .orderBy(col("event_date"))),

    // F4/F5 — JSON parse of the metadata/props payload
    // (kafka+clickhouse.md:143,152).
    "json_props_extract" -> ((s, d) =>
      events(s, d)
        .groupBy(get_json_object(col("props"), "$.k").cast("int")
          .as("k_val"))
        .agg(count(lit(1)).as("total"),
          round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("k_val"))),

    // H5-adjacent — calendar bucketing finer than day (engine surface:
    // time truncation as a first-class rollup key).
    "hourly_rollup" -> ((s, d) =>
      events(s, d)
        .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
          col("event_type").as("level"))
        .agg(count(lit(1)).as("total"))
        .orderBy(col("hour_us"), col("level"))),

    // ReplacingMergeTree analog (the ClickHouse engine-family sibling
    // of the reference's Summing engine): latest state per
    // (user_id, event_type), version = event time, event_id tie.
    "replacing_latest" -> ((s, d) =>
      graft.scale.Maintenance.latestByKey(
          events(s, d).select(col("user_id"), col("event_type"),
            col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("value")),
          Seq(col("user_id"), col("event_type")),
          version = col("ts_us"), tie = col("event_id"))
        .orderBy(col("user_id"), col("event_type"))),

    // ClickHouse `ORDER BY ... WITH FILL` (+ INTERPOLATE) analog:
    // densify a sparse per-(day, level) series onto the full calendar
    // grid — zero-fill for the additive count, last-observation-
    // carried-forward for the gauge column. The grid's bounds derive
    // from the result set itself (ClickHouse's default): a 1-row
    // min/max aggregate exploded through sequence() — never a driver
    // collect — cross-joined to the distinct levels. The cross
    // product is justified (PlanShapeSpec exemption): BOTH sides are
    // calendar/enum-bounded (days x |levels|), independent of corpus
    // size at any scale. Every frame past the daily aggregation is
    // calendar-sized; the one real shuffle is that aggregation.
    "window_gap_fill" -> ((s, d) => {
      // staged: obs feeds THREE consumers (bounds, distinct levels,
      // the join probe) whose differing column pruning defeats
      // exchange reuse — unstaged, the corpus-proportional scan+agg
      // runs three times for a calendar-sized result
      val obs = graft.scale.Staging.materialize(events(s, d)
        .filter(col("value") > 190)
        .groupBy(to_date(col("ts")).as("day"),
          col("event_type").as("level"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("value")), 2).as("sum_val")), "gap-fill-obs")
      val days = obs.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      val grid = days
        .crossJoin(obs.select(col("level")).distinct())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("level")).orderBy(col("day"))
        .rowsBetween(Long.MinValue, 0)
      grid.join(obs, Seq("day", "level"), "left")
        .withColumn("locf_gauge",
          last(col("sum_val"), ignoreNulls = true).over(w))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("level"), coalesce(col("n"), lit(0L)).as("n"),
          col("locf_gauge"))
        .orderBy(col("day"), col("level"))
    }),

    // ClickHouse `WITH FILL INTERPOLATE` with linear interpolation —
    // the gap-fill sibling for gauges where carrying the last value
    // is wrong: each missing day gets prev + (next - prev) * i / gap
    // from the nearest observations on both sides (two directional
    // ignore-nulls windows, both keyed on level — never global).
    // Deliberately NOT rounded: both engines evaluate the identical
    // IEEE-double expression on identical inputs (the observed values
    // are 2-decimal-rounded sums), and each fp op is correctly
    // rounded, so the results are bit-identical without a final
    // round() — which could itself diverge at a .xx5 boundary.
    // Same calendar-bounded grid discipline as window_gap_fill.
    "window_interpolate" -> ((s, d) => {
      // staged for the same three-consumers reason as window_gap_fill
      val obs = graft.scale.Staging.materialize(events(s, d)
        .filter(col("value") > 190)
        .groupBy(to_date(col("ts")).as("day"),
          col("event_type").as("level"))
        .agg(round(sum(col("value")), 2).as("sum_val")),
        "interpolate-obs")
      val days = obs.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 day"))).as("day"))
      val grid = days
        .crossJoin(obs.select(col("level")).distinct())
      val byLevel = org.apache.spark.sql.expressions.Window
        .partitionBy(col("level")).orderBy(col("day"))
      val past = byLevel.rowsBetween(Long.MinValue, 0)
      val future = byLevel.rowsBetween(0, Long.MaxValue)
      val obsDay = when(col("sum_val").isNotNull, col("day"))
      grid.join(obs, Seq("day", "level"), "left")
        .withColumn("prev_val",
          last(col("sum_val"), ignoreNulls = true).over(past))
        .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(past))
        .withColumn("next_val",
          first(col("sum_val"), ignoreNulls = true).over(future))
        .withColumn("next_day",
          first(obsDay, ignoreNulls = true).over(future))
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("level"),
          when(col("sum_val").isNotNull, col("sum_val"))
            .when(col("prev_val").isNull || col("next_val").isNull,
              lit(null).cast("double"))
            .otherwise(col("prev_val") +
              (col("next_val") - col("prev_val"))
                * datediff(col("day"), col("prev_day"))
                / datediff(col("next_day"), col("prev_day")))
            .as("interp_val"))
        .orderBy(col("day"), col("level"))
    }),

    // ClickHouse `SAMPLE n/m` clause analog over the `SAMPLE BY`
    // storage layout: the Knuth sample key is MATERIALIZED as the
    // layout's leading sort key (scale.SampleLayout — ClickHouse puts
    // intHash32(UserID) in the PK for exactly this), so the 1/8
    // sample scan is a contiguous key slab that prunes ~7/8 of files/
    // row groups instead of full-scanning and discarding. Sampling is
    // by ENTITY (user), so per-user analytics stay unbiased; the hash
    // is plain 64-bit arithmetic, so the DuckDB oracle reproduces the
    // exact sample population and the scaled estimates hash-match.
    "sample_clause_estimate" -> ((s, d) => {
      val path = graft.scale.SampleLayout.defaultPath(d)
      graft.scale.SampleLayout.ensureEvents(events(s, d), path)
      graft.scale.SampleLayout.sampleScan(s, path, 1, 8)
        .groupBy(col("event_type").as("level"))
        .agg((count(lit(1)) * 8).as("est_total"),
          round(sum(col("value")) * 8, 2).as("est_sum_value"))
        .orderBy(col("level"))
    }),

    // A7-adjacent — ClickHouse `bloom_filter` skip index: a point
    // probe on a NON-sort high-cardinality column (event_id) through
    // a layout sorted by user_id, where minmax granule stats cannot
    // prune (every row group spans the id range) but the per-row-group
    // parquet bloom can — parquet-mr's RowGroupFilter evaluates it
    // under the pushed equality predicate, no reader code needed.
    // Answers must equal the raw-table probe exactly (blooms have no
    // false negatives), so it oracle-pairs against the base table.
    "events_bloom_skip_lookup" -> ((s, d) => {
      val path = graft.scale.SkipIndex.defaultPath(d)
      graft.scale.SkipIndex.ensureEventsBloom(events(s, d), path)
      s.read.parquet(path)
        .filter(col("event_id") === lit(777))
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .orderBy(col("event_id"))
    })
  )

  val oracles: Map[String, String] = Map(
    "mv_daily_rollup" ->
      """SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        | event_type AS level, count(*) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "mv_level_totals" ->
      """SELECT event_type AS level, count(*) AS total_count
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_point_lookup" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |FROM events
        |WHERE user_id = 7 AND event_type = 'click'
        |ORDER BY ts_us DESC, event_id""".stripMargin,
    "events_point_lookup_sql" ->
      """SELECT event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |FROM events
        |WHERE user_id = 7 AND event_type = 'click'
        |ORDER BY ts_us DESC, event_id""".stripMargin,
    "enum_name_to_code" ->
      """SELECT event_type AS level,
        | CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
        |  WHEN 'purchase' THEN 3 WHEN 'signup' THEN 4
        |  WHEN 'view' THEN 5 END AS code,
        | count(*) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1""".stripMargin,
    "partition_key_yyyymmdd" ->
      """SELECT CAST(strftime(ts, '%Y%m%d') AS INT) AS event_date,
        | count(*) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "json_props_extract" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
        | count(*) AS total, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "hourly_rollup" ->
      """SELECT epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |  AS hour_us,
        | event_type AS level, count(*) AS total
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "replacing_latest" ->
      """SELECT user_id, event_type, event_id,
        | epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
        |FROM events
        |QUALIFY row_number() OVER (PARTITION BY user_id, event_type
        |  ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
        |    event_id DESC) = 1
        |ORDER BY user_id, event_type""".stripMargin,
    "events_bloom_skip_lookup" ->
      """SELECT event_id, user_id, event_type,
        | epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
        |FROM events WHERE event_id = 777
        |ORDER BY event_id""".stripMargin,
    "window_gap_fill" ->
      """WITH obs AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    event_type AS level, count(*) AS n,
        |    round(sum(value), 2) AS sum_val
        |  FROM events WHERE value > 190 GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |lv AS (SELECT DISTINCT level FROM obs),
        |grid AS (SELECT day, level FROM days CROSS JOIN lv)
        |SELECT strftime(g.day, '%Y-%m-%d') AS day, g.level,
        |  coalesce(o.n, 0) AS n,
        |  last_value(o.sum_val IGNORE NULLS) OVER (
        |    PARTITION BY g.level ORDER BY g.day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |   AS locf_gauge
        |FROM grid g LEFT JOIN obs o USING (day, level)
        |ORDER BY 1, 2""".stripMargin,
    "window_interpolate" ->
      """WITH obs AS (
        |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    event_type AS level, round(sum(value), 2) AS sum_val
        |  FROM events WHERE value > 190 GROUP BY 1, 2),
        |b AS (SELECT min(day) AS lo, max(day) AS hi FROM obs),
        |days AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |lv AS (SELECT DISTINCT level FROM obs),
        |grid AS (SELECT day, level FROM days CROSS JOIN lv),
        |j AS (SELECT g.day, g.level, o.sum_val
        |      FROM grid g LEFT JOIN obs o USING (day, level)),
        |f AS (
        |  SELECT day, level, sum_val,
        |    last_value(sum_val IGNORE NULLS) OVER w_past AS prev_val,
        |    last_value(CASE WHEN sum_val IS NOT NULL THEN day END
        |      IGNORE NULLS) OVER w_past AS prev_day,
        |    first_value(sum_val IGNORE NULLS) OVER w_fut AS next_val,
        |    first_value(CASE WHEN sum_val IS NOT NULL THEN day END
        |      IGNORE NULLS) OVER w_fut AS next_day
        |  FROM j
        |  WINDOW
        |    w_past AS (PARTITION BY level ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    w_fut AS (PARTITION BY level ORDER BY day
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT strftime(day, '%Y-%m-%d') AS day, level,
        |  CASE
        |    WHEN sum_val IS NOT NULL THEN sum_val
        |    WHEN prev_val IS NULL OR next_val IS NULL THEN NULL
        |    ELSE prev_val + (next_val - prev_val)
        |      * date_diff('day', prev_day, day)
        |      / date_diff('day', prev_day, next_day)
        |  END AS interp_val
        |FROM f ORDER BY 1, 2""".stripMargin,
    "sample_clause_estimate" ->
      """SELECT event_type AS level, count(*) * 8 AS est_total,
        |  round(sum(value) * 8, 2) AS est_sum_value
        |FROM events
        |WHERE (((((user_id % 4294967296) >> 16) * 2654435761)
        |         % 4294967296) * 65536
        |       + (user_id & 65535) * 2654435761) % 4294967296
        |      < 536870912
        |GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
