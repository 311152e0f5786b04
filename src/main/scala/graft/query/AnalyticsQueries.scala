package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Funnel, TextAnalysis}

/** Product/behavioral analytics + corpus-LM surface: the windowFunnel /
  * retention / argMax / histogram idioms a user of the reference's
  * ClickHouse-backed events table runs daily (kafka+clickhouse.md:
  * 453-470 is exactly this rollup family), plus correlated scalar
  * subqueries and a corpus-unigram LM quality gate. Each oracle-paired
  * against a plain-SQL DuckDB formulation of identical semantics.
  */
object AnalyticsQueries {

  private val dayUs = 24L * 3600L * 1000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Ordered 3-step funnel view→click→purchase, 24 h window from the
    // earliest view (ClickHouse windowFunnel analog; Funnel.userLevels
    // documents the earliest-anchor greedy semantics both engines pin).
    "funnel_steps" -> ((s, d) =>
      Funnel.userLevels(Tables.events(s, d), col("user_id"),
          unix_micros(col("ts")),
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowUs = dayUs)
        .groupBy(col("funnel_level"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("funnel_level"))),

    // The SAME funnel as an in-plan fold (ClickHouse windowFunnel's
    // actual shape — see Funnel.userLevelsFold): no joins, one shuffle
    // on user, the chain folded through a codegen'd HOF. Shares
    // funnel_steps' oracle because default-mode semantics are
    // identical (also property-pinned against userLevels).
    "funnel_steps_fold" -> ((s, d) =>
      Funnel.userLevelsFold(Tables.events(s, d), col("user_id"),
          unix_micros(col("ts")),
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowUs = dayUs)
        .groupBy(col("funnel_level"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("funnel_level"))),

    // windowFunnel('strict_order') mode: a chain in progress dies on
    // ANY event that does not advance it (funnel-related or not), as
    // in ClickHouse. Mode behavior pinned in FunnelSpec.
    "funnel_steps_strict" -> ((s, d) =>
      Funnel.userLevelsFold(Tables.events(s, d), col("user_id"),
          unix_micros(col("ts")),
          Seq(col("event_type") === "view", col("event_type") === "click",
            col("event_type") === "purchase"), windowUs = dayUs,
          strictOrder = true)
        .groupBy(col("funnel_level"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy(col("funnel_level"))),

    // Time-to-convert over the same greedy funnel chain: per-step
    // completion counts plus mean / median conversion latency between
    // consecutive steps. Aggregates run on integer microsecond diffs
    // (FP-exact below 2^53) and divide to seconds only at the end, so
    // both engines round identical values.
    "funnel_step_durations" -> ((s, d) => {
      val st = Funnel.stepTimes(Tables.events(s, d), col("user_id"),
        unix_micros(col("ts")),
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), windowUs = dayUs)
      st.agg(
        count(col("t1_us")).as("n_step1"),
        count(col("t2_us")).as("n_step2"),
        count(col("t3_us")).as("n_step3"),
        round(avg(col("t2_us") - col("t1_us")) / 1000000.0, 3)
          .as("avg_s_view_click"),
        round(avg(col("t3_us") - col("t2_us")) / 1000000.0, 3)
          .as("avg_s_click_purchase"),
        round(percentile(col("t2_us") - col("t1_us"), lit(0.5))
          / 1000000.0, 3).as("p50_s_view_click"))
    }),

    // Day-N cohort retention (ClickHouse retention analog): users
    // bucketed by first-seen day; exact-day returns at +1/+7/+14.
    "retention_cohort" -> ((s, d) =>
      Funnel.retention(Tables.events(s, d), col("user_id"), col("ts"),
          Seq(1, 7, 14))
        .select(date_format(col("c_day"), "yyyy-MM-dd").as("cohort_day"),
          col("n_users"), col("d1"), col("d7"), col("d14"))
        .orderBy(col("cohort_day"))),

    // argMax/argMin (the ClickHouse signature aggregate): per event
    // type, the user with the highest/lowest total value. max/min over
    // a (total, user_id) struct — lexicographic, so ties resolve on
    // user_id deterministically in both engines; no window needed.
    "agg_argmax" -> ((s, d) => {
      val tot = Tables.events(s, d)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(col("value")).as("total"))
      tot.groupBy(col("event_type"))
        .agg(max(struct(col("total"), col("user_id"))).as("mx"),
          min(struct(col("total"), col("user_id"))).as("mn"))
        .select(col("event_type"),
          col("mx.user_id").as("top_user"),
          round(col("mx.total"), 2).as("top_total"),
          col("mn.user_id").as("bottom_user"),
          round(col("mn.total"), 2).as("bottom_total"))
        .orderBy(col("event_type"))
    }),

    // Fixed-width price histogram (ClickHouse histogram analog, with
    // deterministic bins instead of its adaptive ones): one map-side-
    // combined aggregate over a 2-column scan; min/max per bin are
    // exact (no float-sum order sensitivity).
    "agg_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(floor(col("l_extendedprice") / 5000).cast("long")
          .as("bin"))
        .agg(count(lit(1)).as("n_items"),
          round(min(col("l_extendedprice")), 2).as("lo_price"),
          round(max(col("l_extendedprice")), 2).as("hi_price"))
        .orderBy(col("bin"))),

    // Correlated scalar subqueries (two per row — count + sum), the
    // "above this customer's average" shape. Phrased as price*count >
    // sum in exact decimals so neither engine divides doubles at the
    // comparison boundary. Catalyst decorrelates both subqueries into
    // one aggregate + join on o_custkey — no per-row re-scan.
    "subquery_scalar_correlated" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderkey, o_custkey, o_totalprice
              |FROM orders_v o
              |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
              |    (SELECT count(*) FROM orders_v o2
              |     WHERE o2.o_custkey = o.o_custkey)
              |  > (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
              |     FROM orders_v o3 WHERE o3.o_custkey = o.o_custkey)
              |ORDER BY o_orderkey""".stripMargin)
    }),

    // Corpus-unigram LM score per document (CCNet-style quality gate).
    "text_unigram_loglik" -> ((s, d) =>
      TextAnalysis.unigramLogLik(Tables.documents(s, d), col("doc_id"),
          col("text"))
        .orderBy(col("doc_id"))),

    // CCNet head/middle/tail split (Wenzek et al. 2020): per-language
    // LM-score terciles — bucket 1 is the "head" a pre-training mix
    // keeps preferentially. THRESHOLD-bucketed, the shape CCNet itself
    // uses, not a global rank: an ntile(3) window partitioned by lang
    // funnels EVERY doc of a language through one task (billions at
    // 100 TB — the full-sort-on-a-skewed-key scale-killer). Instead:
    //   1. histogram the ROUNDED score per (lang, avg_loglik) — one
    //      map-side-combined agg; distinct 3-decimal scores are
    //      bounded by the score VALUE DOMAIN (a few thousand values),
    //      independent of corpus size;
    //   2. cumulative counts over that histogram (the only window —
    //      its per-lang partition is the value-domain-bounded
    //      distinct-score set, never the corpus);
    //   3. cut points c1/c2 = the score at descending rank ceil(n/3)
    //      / ceil(2n/3) — an exact order statistic: the largest score
    //      whose cumulative count reaches the rank — as a |langs|-row
    //      aggregate, broadcast;
    //   4. bucket every doc by two comparisons in the scan's codegen
    //      span. Ties at a cut all land in the better bucket (the
    //      threshold semantics; exact and engine-portable, so the
    //      DuckDB oracle formulates the SAME order statistic).
    "sample_quality_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ll = TextAnalysis.unigramLogLik(docs, col("doc_id"),
        col("text"))
      val j = ll.join(docs.select(col("doc_id"), col("lang")),
        Seq("doc_id"))
      // Round-15 shape (optimization round; guide §2.3 "decide with
      // small rows"): every output aggregate is a function of the
      // (lang, avg_loglik) HISTOGRAM — n_docs = Σcnt, words = Σ(per-
      // score word sums), min/max_ll = extremes of the bucket's score
      // values — so bucket assignment now runs on the value-domain-
      // bounded histogram rows instead of re-scanning the corpus-sized
      // scored frame (the old second pass + its exchange are gone; the
      // per-doc frame now has ONE consumer and needs no stage). The
      // histogram replaces it as the staged frame — it feeds both the
      // cuts branch and the bucket aggregation, and is bounded by the
      // distinct-score domain, not the corpus.
      val hist = graft.scale.Staging.materialize(
        j.groupBy(col("lang"), col("avg_loglik"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("n_words")).as("words_sum")), "quality-hist")
      val wcum = Window.partitionBy(col("lang"))
        .orderBy(col("avg_loglik").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cuts = hist
        .withColumn("cum", sum(col("cnt")).over(wcum))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("lang"))))
        .groupBy(col("lang"))
        .agg(
          max(when(col("cum") >= ceil(col("n") / 3.0),
            col("avg_loglik"))).as("c1"),
          max(when(col("cum") >= ceil(col("n") * 2.0 / 3.0),
            col("avg_loglik"))).as("c2"))
      hist.join(broadcast(cuts), Seq("lang"))
        .withColumn("bucket",
          when(col("avg_loglik") >= col("c1"), 1L)
            .when(col("avg_loglik") >= col("c2"), 2L)
            .otherwise(3L))
        .groupBy(col("lang"), col("bucket"))
        .agg(sum(col("cnt")).as("n_docs"),
          sum(col("words_sum")).as("words"),
          min(col("avg_loglik")).as("min_ll"),
          max(col("avg_loglik")).as("max_ll"))
        .orderBy(col("lang"), col("bucket"))
    }),

    // Event-sequence pattern match (ClickHouse sequenceMatch/
    // sequenceCount analog): each user's events collapse to a 1-char-
    // per-event code string in (ts, event_id) order, then plain regex
    // answers "did view→click→purchase happen ADJACENTLY" and "how
    // many click→purchase pairs". One shuffle on user_id; per-user
    // sequences are bounded (events-per-user), and the regex runs
    // codegen'd per group — no joins at all.
    "sequence_match_users" -> ((s, d) => {
      val code = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e")
      val seqs = Tables.events(s, d)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("ts_us"),
            col("event_id"), code.as("code")).as("ev"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(sort_array(collect_list(col("ev"))),
          x => x.getField("code")), "").as("seq"))
      seqs.select(col("user_id"),
          length(col("seq")).cast("long").as("seq_len"),
          regexp_like(col("seq"), lit("vcp")).cast("int").as("m_strict"),
          ((length(col("seq")) -
            length(regexp_replace(col("seq"), "cp", ""))) / 2)
            .cast("long").as("n_cp"))
        .orderBy(col("user_id"))
    }),

    // ClickHouse sequenceCount('(?1)(?2)') analog with GAPS: count
    // NON-OVERLAPPING click→purchase chains per user, where any other
    // events may intervene. The greedy left-to-right chain scan is
    // exactly leftmost non-overlapping matching of 'c[^p]*p' (first c,
    // first p after it, resume past that p) — one codegen'd regexp
    // over the per-user sequence string, no joins. m_gapped is the
    // gap-allowing 3-step sequenceMatch('(?1).*(?2).*(?3)') twin of
    // sequence_match_users' adjacent-only m_strict.
    "sequence_count_chains" -> ((s, d) => {
      val code = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e")
      Tables.events(s, d)
        .select(col("user_id"),
          struct(unix_micros(col("ts")).as("ts_us"),
            col("event_id"), code.as("code")).as("ev"))
        .groupBy(col("user_id"))
        .agg(array_join(transform(sort_array(collect_list(col("ev"))),
          x => x.getField("code")), "").as("seq"))
        .select(col("user_id"),
          regexp_count(col("seq"), lit("c[^p]*p")).cast("long")
            .as("n_chains"),
          regexp_like(col("seq"), lit("v.*c.*p")).cast("int")
            .as("m_gapped"))
        .orderBy(col("user_id"))
    }),

    // ClickHouse sumMap analog: per event type, a key→sum MAP built
    // in-plan (map_from_entries over the sorted per-key sums), with
    // the outputs derived FROM the map — entry count, total via an
    // aggregate HOF over map_values, and the deterministic argmax
    // entry (max sum, ties to the smallest key, picked by sorting
    // entries on (-sum, key)). Keys come out of the props JSON. The
    // per-key sums are rounded BEFORE the map so both engines
    // tie-break the argmax on identical values.
    "agg_sum_map" -> ((s, d) => {
      // null keys (props without "$.k") are excluded BEFORE the map —
      // map_from_entries throws on a null key; oracle mirrors the
      // filter so both engines count the same key set
      val perKey = Tables.events(s, d)
        .groupBy(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .agg(round(sum(col("value")), 2).as("v"))
        .filter(col("k").isNotNull)
      perKey.groupBy(col("event_type"))
        .agg(
          map_from_entries(sort_array(collect_list(
            struct(col("k"), col("v"))))).as("m"),
          element_at(sort_array(collect_list(
            struct((-col("v")).as("nv"), col("k")))), 1).as("top"))
        .select(col("event_type"),
          size(map_keys(col("m"))).cast("long").as("n_keys"),
          col("top").getField("k").as("top_k"),
          (-col("top").getField("nv")).as("top_sum"),
          round(aggregate(map_values(col("m")), lit(0.0),
            (acc, x) => acc + x), 2).as("total_sum"))
        .orderBy(col("event_type"))
    }),

    // ClickHouse entropy + simpleLinearRegression analogs: per event
    // type, the Shannon entropy (bits) of the props-key distribution
    // and the least-squares (slope, intercept) of value on key. Both
    // derive from EXPLICIT sums: the entropy terms are computed from
    // identical integer counts on both engines (only the summation
    // order differs — absorbed by the agg_stats_funcs 4-decimal
    // convention), and the regression is the closed form over five
    // plain sums rather than an engine-specific regr_* function.
    "agg_entropy_linreg" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          col("value"))
      val perKey = ev.groupBy(col("event_type"), col("k"))
        .agg(count(lit(1)).as("c"))
      val ent = perKey
        .withColumn("n",
          sum(col("c")).over(Window.partitionBy(col("event_type"))))
        .groupBy(col("event_type"))
        .agg(round(-sum((col("c") / col("n")) *
          log2(col("c") / col("n"))), 4).as("entropy_bits"))
      val reg = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum(col("k").cast("double")).as("sx"),
          sum(col("value")).as("sy"),
          sum(col("k") * col("value")).as("sxy"),
          sum(col("k").cast("double") * col("k")).as("sxx"))
        .withColumn("slope_raw",
          (col("n") * col("sxy") - col("sx") * col("sy")) /
            (col("n") * col("sxx") - col("sx") * col("sx")))
        .select(col("event_type").as("et"),
          round(col("slope_raw"), 4).as("slope"),
          round((col("sy") - col("slope_raw") * col("sx")) / col("n"), 4)
            .as("intercept"))
      ent.join(reg, col("event_type") === col("et"))
        .select(col("event_type"), col("entropy_bits"), col("slope"),
          col("intercept"))
        .orderBy(col("event_type"))
    }),

    // Ratio-to-report (share of group total — the classic dashboard
    // percent-of-total): each (day, event_type)'s value mass as a
    // share of its day's total. WINDOW-FREE formulation: the
    // per-(day, type) rollup joins its day totals back (|days| rows,
    // broadcast) — a `sum over (partition by day)` window funnels
    // every row of a day through one task, which at 100 TB is a
    // hot-partition full-pass; the rollup+join shape shuffles only
    // aggregated rows. Share is rounded from ONE division of two
    // exact 2-decimal sums (both engines compose the same quotient).
    "window_ratio_to_report" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(to_date(col("ts")).cast("string").as("day"),
          col("event_type"))
        .agg(round(sum(col("value")), 2).as("sum_value"))
      val totals = daily.groupBy(col("day"))
        .agg(sum(col("sum_value")).as("day_total"))
      daily.join(broadcast(totals), Seq("day"))
        .select(col("day"), col("event_type"), col("sum_value"),
          round(col("sum_value") / col("day_total"), 6).as("share"))
        .orderBy(col("day"), col("event_type"))
    }),

    // 7-day rolling distinct users per day (the WAU curve): exact
    // sliding-window uniques WITHOUT a sliding self-join — each
    // distinct (user, day) pair fans out to the <= 7 target days its
    // activity covers, then one distinct + count per target day.
    // Scale shape: fan-out is a constant 7x over the DISTINCT pair
    // set (already << events), the heavy distinct is map-side
    // combined, and no day ever funnels raw events through one task.
    // Only target days with a full 7-day lookback INSIDE the data
    // range are emitted (boundary days would undercount by
    // construction — the honest window).
    "window_sliding_uniques" -> ((s, d) => {
      val pairs = Tables.events(s, d)
        .select(col("user_id"),
          datediff(to_date(col("ts")), lit("2024-01-01")).as("dnum"))
        .distinct()
      // 1-row driver read for the day-range bounds (the accepted
      // bounded-collect class) — literal filters instead of a 1-row
      // crossJoin that would BNLJ into the quadratic-join sweep
      val b = pairs.agg(min("dnum").as("lo"), max("dnum").as("hi"))
        .head()
      val (lo, hi) = (b.getInt(0), b.getInt(1))
      pairs
        .select(col("user_id"),
          explode(sequence(col("dnum"), col("dnum") + 6)).as("t"))
        .filter(col("t") >= lo + 6 && col("t") <= hi)
        .groupBy(col("t"))
        .agg(countDistinct(col("user_id")).as("wau"))
        .select(date_add(lit("2024-01-01"), col("t").cast("int"))
          .cast("string").as("day"), col("wau"))
        .orderBy(col("day"))
    }),

    // Hopping (sliding) window rollup — 1 h windows every 30 min, so
    // each event lands in exactly 2 windows (the batch twin of the
    // streaming WindowedRollup pipeline; epoch-aligned like Spark's
    // window()). One explode-by-2 then a map-side-combined aggregate.
    "hopping_rollup" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("total"),
          round(sum(col("value")), 2).as("sum_value"))
        .select(unix_micros(col("w.start")).as("ws_us"),
          col("event_type"), col("total"), col("sum_value"))
        .orderBy(col("ws_us"), col("event_type"))),

    // Time-series gap filling (ClickHouse ORDER BY ... WITH FILL /
    // INTERPOLATE analog): per-type hourly rollup densified to a
    // complete hour spine, missing hours filled with 0 and the last
    // seen hourly sum carried forward. The spine is generated per type
    // from its own [min, max] (sequence + explode — no cross join, no
    // driver materialization); the join back is a plain equi-join and
    // the carry-forward is one window over the same partitioning.
    "timeseries_fill_hours" -> ((s, d) => {
      val h = Tables.events(s, d)
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      val spine = h.groupBy(col("event_type"))
        .agg(min("hour_us").as("lo"), max("hour_us").as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), lit(3600000000L)))
            .as("hour_us"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("hour_us"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(h, Seq("event_type", "hour_us"), "left")
        .select(col("event_type"), col("hour_us"),
          coalesce(col("n"), lit(0L)).as("n_events"),
          last(col("v"), ignoreNulls = true).over(w).as("carried_v"))
        .orderBy(col("event_type"), col("hour_us"))
    }),

    // Robust outlier gate (median/MAD, the statistical sibling of the
    // heuristic quality filters): docs whose length deviates from
    // their language's median by >1.5 MAD. Exact medians here (tiny
    // group count; swap percentile -> percentile_approx for the
    // 100 TB path, same plan shape). All joins are on the 5-row lang
    // key, broadcast automatically; comparisons stay exact because
    // integer-vs-half-integer arithmetic is exact in doubles.
    "quality_outliers_mad" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val med = docs.groupBy(col("lang"))
        .agg(percentile(col("n_chars"), lit(0.5)).as("m"))
      val dev = docs.join(med, "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          abs(col("n_chars") - col("m")).as("dv"))
      val mad = dev.groupBy(col("lang"))
        .agg(percentile(col("dv"), lit(0.5)).as("mad"))
      dev.join(mad, "lang")
        .select(col("doc_id"), col("lang"), col("n_chars"),
          (col("dv") > lit(1.5) * col("mad")).cast("int")
            .as("is_outlier"))
        .orderBy(col("doc_id"))
    })
  )

  // funnel_steps_fold shares this oracle: the fold implementation is
  // semantically identical to the join-based one in default mode
  // (property-pinned in FunnelProps).
  private val funnelStepsOracle =
    s"""WITH t AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |u AS (SELECT DISTINCT user_id FROM t),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM t
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT t.user_id, min(ts_us) AS t2 FROM t
        |    JOIN s1 USING(user_id)
        |  WHERE event_type = 'click' AND ts_us > t1
        |    AND ts_us <= t1 + $dayUs GROUP BY 1),
        |s3 AS (SELECT t.user_id, min(ts_us) AS t3 FROM t
        |    JOIN s2 USING(user_id) JOIN s1 USING(user_id)
        |  WHERE event_type = 'purchase' AND ts_us > t2
        |    AND ts_us <= t1 + $dayUs GROUP BY 1)
        |SELECT funnel_level, count(*) AS n_users FROM (
        |  SELECT u.user_id,
        |    CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
        |      WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS funnel_level
        |  FROM u LEFT JOIN s1 USING(user_id) LEFT JOIN s2 USING(user_id)
        |    LEFT JOIN s3 USING(user_id))
        |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "funnel_steps" -> funnelStepsOracle,
    "funnel_steps_fold" -> funnelStepsOracle,
    // strict_order is sequential, but its OUTCOME is a function of only
    // the first step-1 event and the two events immediately after it in
    // the per-user sort (any other shape interrupts the chain) — so it
    // IS SQL-expressible: window-number the events, locate the anchor,
    // pivot out positions a/a+1/a+2, and score the level from that trio.
    // The ORDER BY replicates the fold's full tie-break (ts, matches-any,
    // per-step match vector) for same-timestamp determinism.
    "funnel_steps_strict" ->
      s"""WITH ord AS (
        |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us,
        |    event_type = 'view' AS is_v, event_type = 'click' AS is_c,
        |    event_type = 'purchase' AS is_p,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(CAST(ts AS TIMESTAMP)),
        |        (event_type IN ('view','click','purchase')),
        |        [event_type='view', event_type='click',
        |         event_type='purchase']) AS rn
        |  FROM events),
        |anch AS (SELECT user_id, min(rn) AS a FROM ord
        |  WHERE is_v GROUP BY 1),
        |trio AS (
        |  SELECT ord.user_id,
        |    max(CASE WHEN rn = a THEN us END) AS t1,
        |    max(CASE WHEN rn = a + 1 THEN us END) AS u2,
        |    bool_or(CASE WHEN rn = a + 1 THEN is_c END) AS c2,
        |    max(CASE WHEN rn = a + 2 THEN us END) AS u3,
        |    bool_or(CASE WHEN rn = a + 2 THEN is_p END) AS p3
        |  FROM ord JOIN anch USING (user_id)
        |  GROUP BY 1),
        |lvl AS (
        |  SELECT u.user_id,
        |    CASE WHEN t1 IS NULL THEN 0
        |         WHEN c2 AND u2 > t1 AND u2 <= t1 + $dayUs
        |              AND p3 AND u3 > u2 AND u3 <= t1 + $dayUs THEN 3
        |         WHEN c2 AND u2 > t1 AND u2 <= t1 + $dayUs THEN 2
        |         ELSE 1 END AS funnel_level
        |  FROM (SELECT DISTINCT user_id FROM events) u
        |  LEFT JOIN trio USING (user_id))
        |SELECT funnel_level, count(*) AS n_users FROM lvl
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "funnel_step_durations" ->
      s"""WITH t AS (SELECT user_id, event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |s1 AS (SELECT user_id, min(ts_us) AS t1 FROM t
        |  WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT t.user_id, min(ts_us) AS t2 FROM t
        |    JOIN s1 USING(user_id)
        |  WHERE event_type = 'click' AND ts_us > t1
        |    AND ts_us <= t1 + $dayUs GROUP BY 1),
        |s3 AS (SELECT t.user_id, min(ts_us) AS t3 FROM t
        |    JOIN s2 USING(user_id) JOIN s1 USING(user_id)
        |  WHERE event_type = 'purchase' AND ts_us > t2
        |    AND ts_us <= t1 + $dayUs GROUP BY 1)
        |SELECT count(t1) AS n_step1, count(t2) AS n_step2,
        |  count(t3) AS n_step3,
        |  round(avg(t2 - t1) / 1000000.0, 3) AS avg_s_view_click,
        |  round(avg(t3 - t2) / 1000000.0, 3) AS avg_s_click_purchase,
        |  round(quantile_cont(t2 - t1, 0.5) / 1000000.0, 3)
        |    AS p50_s_view_click
        |FROM s1 LEFT JOIN s2 USING(user_id)
        |  LEFT JOIN s3 USING(user_id)""".stripMargin,
    "retention_cohort" ->
      """WITH t AS (SELECT user_id,
        |    CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
        |a AS (SELECT DISTINCT user_id, day FROM t),
        |c AS (SELECT user_id, min(day) AS c_day FROM a GROUP BY 1)
        |SELECT strftime(c_day, '%Y-%m-%d') AS cohort_day,
        |  count(DISTINCT a.user_id) AS n_users,
        |  count(DISTINCT CASE WHEN day = c_day + 1 THEN a.user_id END)
        |    AS d1,
        |  count(DISTINCT CASE WHEN day = c_day + 7 THEN a.user_id END)
        |    AS d7,
        |  count(DISTINCT CASE WHEN day = c_day + 14 THEN a.user_id END)
        |    AS d14
        |FROM a JOIN c USING(user_id) GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_argmax" ->
      """WITH tot AS (SELECT event_type, user_id, sum(value) AS total
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type,
        |    max({'total': total, 'user_id': user_id}) AS mx,
        |    min({'total': total, 'user_id': user_id}) AS mn
        |  FROM tot GROUP BY 1)
        |SELECT event_type, mx.user_id AS top_user,
        |  round(mx.total, 2) AS top_total,
        |  mn.user_id AS bottom_user, round(mn.total, 2) AS bottom_total
        |FROM m ORDER BY 1""".stripMargin,
    "agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bin,
        |  count(*) AS n_items, round(min(l_extendedprice), 2) AS lo_price,
        |  round(max(l_extendedprice), 2) AS hi_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "subquery_scalar_correlated" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM orders o2
        |     WHERE o2.o_custkey = o.o_custkey)
        |  > (SELECT sum(CAST(o3.o_totalprice AS DECIMAL(18,2)))
        |     FROM orders o3 WHERE o3.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,
    "sequence_match_users" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS code FROM events),
        |seqs AS (SELECT user_id,
        |    string_agg(code, '' ORDER BY ts_us, event_id) AS seq
        |  FROM t GROUP BY 1)
        |SELECT user_id, len(seq) AS seq_len,
        |  CAST(regexp_matches(seq, 'vcp') AS INT) AS m_strict,
        |  CAST((len(seq) - len(replace(seq, 'cp', ''))) / 2 AS BIGINT)
        |    AS n_cp
        |FROM seqs ORDER BY user_id""".stripMargin,
    "sequence_count_chains" ->
      """WITH t AS (SELECT user_id, event_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
        |    CASE event_type WHEN 'view' THEN 'v' WHEN 'click' THEN 'c'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS code FROM events),
        |seqs AS (SELECT user_id,
        |    string_agg(code, '' ORDER BY ts_us, event_id) AS seq
        |  FROM t GROUP BY 1)
        |SELECT user_id,
        |  CAST(len(regexp_extract_all(seq, 'c[^p]*p')) AS BIGINT)
        |    AS n_chains,
        |  CAST(regexp_matches(seq, 'v.*c.*p') AS INT) AS m_gapped
        |FROM seqs ORDER BY user_id""".stripMargin,
    "agg_sum_map" ->
      """WITH pk AS (
        |  SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |    round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2),
        |rk AS (SELECT event_type, k, v, row_number() OVER (
        |    PARTITION BY event_type ORDER BY v DESC, k) AS rn
        |  FROM pk WHERE k IS NOT NULL)
        |SELECT p.event_type, CAST(count(*) AS BIGINT) AS n_keys,
        |  max(CASE WHEN rn = 1 THEN k END) AS top_k,
        |  max(CASE WHEN rn = 1 THEN v END) AS top_sum,
        |  round(sum(v), 2) AS total_sum
        |FROM rk p GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_entropy_linreg" ->
      """WITH ev AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INT) AS k, value
        |  FROM events),
        |pk AS (SELECT event_type, k, count(*) AS c FROM ev
        |  GROUP BY 1, 2),
        |ent AS (SELECT event_type,
        |    round(-sum((CAST(c AS DOUBLE) / n) *
        |      log2(CAST(c AS DOUBLE) / n)), 4) AS entropy_bits
        |  FROM (SELECT event_type, c, CAST(sum(c) OVER (
        |      PARTITION BY event_type) AS DOUBLE) AS n FROM pk)
        |  GROUP BY 1),
        |sums AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    sum(CAST(k AS DOUBLE)) AS sx, sum(value) AS sy,
        |    sum(k * value) AS sxy,
        |    sum(CAST(k AS DOUBLE) * k) AS sxx
        |  FROM ev GROUP BY 1),
        |reg AS (SELECT event_type, sy, sx, n,
        |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_raw
        |  FROM sums)
        |SELECT e.event_type, entropy_bits,
        |  round(slope_raw, 4) AS slope,
        |  round((sy - slope_raw * sx) / n, 4) AS intercept
        |FROM ent e JOIN reg r ON e.event_type = r.event_type
        |ORDER BY 1""".stripMargin,
    // The ORACLE may window; the registered plan must not (the
    // hot-partition rule — same split as sample_quality_buckets).
    "window_ratio_to_report" ->
      """WITH daily AS (SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
        |    event_type, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2)
        |SELECT day, event_type, sum_value,
        |  round(sum_value / sum(sum_value) OVER (PARTITION BY day), 6)
        |    AS share
        |FROM daily ORDER BY day, event_type""".stripMargin,
    // Same fan-out formulation: each distinct (user, day) pair covers
    // its <= 7 target days; only fully-covered target days emit.
    "window_sliding_uniques" ->
      """WITH pairs AS (SELECT DISTINCT user_id,
        |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |      AS dnum
        |  FROM events),
        |b AS (SELECT min(dnum) AS lo, max(dnum) AS hi FROM pairs),
        |fan AS (SELECT user_id, dnum + k.k AS t
        |  FROM pairs, LATERAL (SELECT unnest(range(0, 7)) AS k) k)
        |SELECT CAST(CAST(DATE '2024-01-01' + t * INTERVAL 1 DAY
        |      AS DATE) AS VARCHAR) AS day,
        |  count(DISTINCT user_id) AS wau
        |FROM fan CROSS JOIN b
        |WHERE t >= lo + 6 AND t <= hi
        |GROUP BY t ORDER BY day""".stripMargin,
    "hopping_rollup" ->
      """WITH t AS (SELECT event_type, value,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us FROM events),
        |k AS (SELECT 0 AS k UNION ALL SELECT 1),
        |w AS (SELECT event_type, value,
        |    ((ts_us // 1800000000) - k) * 1800000000 AS ws_us
        |  FROM t CROSS JOIN k
        |  WHERE ts_us < ((ts_us // 1800000000) - k) * 1800000000
        |    + 3600000000)
        |SELECT ws_us, event_type, count(*) AS total,
        |  round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "quality_outliers_mad" ->
      """WITH med AS (SELECT lang, median(n_chars) AS m
        |  FROM documents GROUP BY 1),
        |dev AS (SELECT d.doc_id, d.lang, d.n_chars,
        |    abs(d.n_chars - m) AS dv
        |  FROM documents d JOIN med USING(lang)),
        |mad AS (SELECT lang, median(dv) AS mad FROM dev GROUP BY 1)
        |SELECT dev.doc_id, dev.lang, dev.n_chars,
        |  CAST(dev.dv > 1.5 * mad.mad AS INT) AS is_outlier
        |FROM dev JOIN mad USING(lang) ORDER BY dev.doc_id""".stripMargin,
    "timeseries_fill_hours" ->
      """WITH h AS (SELECT event_type,
        |    epoch_us(date_trunc('hour', CAST(ts AS TIMESTAMP)))
        |      AS hour_us,
        |    count(*) AS n, round(sum(value), 2) AS v
        |  FROM events GROUP BY 1, 2),
        |b AS (SELECT event_type, min(hour_us) AS lo, max(hour_us) AS hi
        |  FROM h GROUP BY 1),
        |spine AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, 3600000000)) AS hour_us
        |  FROM b)
        |SELECT s.event_type, s.hour_us, coalesce(n, 0) AS n_events,
        |  last_value(v IGNORE NULLS) OVER (PARTITION BY s.event_type
        |    ORDER BY s.hour_us ROWS UNBOUNDED PRECEDING) AS carried_v
        |FROM spine s LEFT JOIN h
        |  ON s.event_type = h.event_type AND s.hour_us = h.hour_us
        |ORDER BY s.event_type, s.hour_us""".stripMargin,
    "text_unigram_loglik" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text),
        |    '[^a-z]+')) AS word FROM documents),
        |wf AS (SELECT doc_id, word FROM w WHERE word <> ''),
        |c AS (SELECT word, count(*) AS c FROM wf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM wf)
        |SELECT doc_id, count(*) AS n_words,
        |  round(avg(ln(c)) - ln(n), 3) AS avg_loglik
        |FROM wf JOIN c USING(word) CROSS JOIN n
        |GROUP BY doc_id, n ORDER BY doc_id""".stripMargin,
    // Same order statistic as the Spark side: c1/c2 = the score at
    // descending rank ceil(n/3) / ceil(2n/3) per lang (formulated via
    // row_number here — the ORACLE may sort; the registered plan must
    // not), then threshold-bucket by comparison. Ties at a cut land in
    // the better bucket on both engines.
    "sample_quality_buckets" ->
      """WITH w AS (SELECT doc_id, unnest(string_split_regex(lower(text),
        |    '[^a-z]+')) AS word FROM documents),
        |wf AS (SELECT doc_id, word FROM w WHERE word <> ''),
        |c AS (SELECT word, count(*) AS c FROM wf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM wf),
        |ll AS (SELECT doc_id, count(*) AS n_words,
        |    round(avg(ln(c)) - ln(n), 3) AS avg_loglik
        |  FROM wf JOIN c USING(word) CROSS JOIN n GROUP BY doc_id, n),
        |j AS (SELECT d.lang, ll.n_words, ll.avg_loglik
        |  FROM ll JOIN documents d USING (doc_id)),
        |r AS (SELECT lang, avg_loglik,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY avg_loglik DESC) AS rk,
        |    count(*) OVER (PARTITION BY lang) AS n
        |  FROM j),
        |cuts AS (SELECT lang,
        |    max(CASE WHEN rk = CAST(ceil(n / 3.0) AS BIGINT)
        |      THEN avg_loglik END) AS c1,
        |    max(CASE WHEN rk = CAST(ceil(n * 2.0 / 3.0) AS BIGINT)
        |      THEN avg_loglik END) AS c2
        |  FROM r GROUP BY lang),
        |b AS (SELECT j.lang, j.n_words, j.avg_loglik,
        |    CASE WHEN j.avg_loglik >= cuts.c1 THEN 1
        |         WHEN j.avg_loglik >= cuts.c2 THEN 2
        |         ELSE 3 END AS bucket
        |  FROM j JOIN cuts USING (lang))
        |SELECT lang, CAST(bucket AS BIGINT) AS bucket,
        |  count(*) AS n_docs, CAST(sum(n_words) AS BIGINT) AS words,
        |  min(avg_loglik) AS min_ll, max(avg_loglik) AS max_ll
        |FROM b GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
  )
}
