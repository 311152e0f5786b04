package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining general-SQL operator surface: predicate varieties (IN /
  * LIKE / BETWEEN / OR / NOT), outer joins, lag/lead windows, HAVING,
  * scalar string and date functions — each oracle-paired. Together with
  * [[StarSchemaQueries]] this makes every absence row of SURVEY.md §2
  * (C/D/E/F/G) a covered operator.
  */
object SqlSurfaceQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast("decimal(12,2)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // C-row extensions: IN, LIKE, BETWEEN, OR, NOT in one predicate.
    "pred_in_like_range" -> ((s, d) =>
      Tables.orders(s, d)
        .filter(
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
            col("o_totalprice").between(50000, 200000) &&
            (col("o_orderstatus") === "F" ||
              !col("o_orderstatus").isin("P")))
        .join(broadcast(Tables.customer(s, d)
          .filter(col("c_name").like("Customer#0000000%"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Full outer join with null-coalesced output: per-customer order
    // count vs high-balance customer set.
    "join_full_outer" -> ((s, d) => {
      val counts = Tables.orders(s, d)
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      val rich = Tables.customer(s, d)
        .filter(col("c_acctbal") > 9000)
        .select(col("c_custkey"), col("c_acctbal"))
      counts.join(rich, col("o_custkey") === col("c_custkey"),
          "full_outer")
        .select(
          coalesce(col("o_custkey"), col("c_custkey")).as("custkey"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("c_acctbal"), lit(-1.0)).as("acctbal"))
        .orderBy(col("custkey"))
    }),

    // Left outer join preserving unmatched left rows.
    "join_left_outer" -> ((s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"))
        .orderBy(col("c_custkey"))),

    // E-row extensions: min/max/avg + HAVING-style post-agg filter.
    "agg_minmax_having" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          round(avg(dec2(col("l_quantity"))), 2).cast("double")
            .as("avg_qty"),
          round(sum(dec2(col("l_extendedprice"))), 2).cast("double")
            .as("sum_price"))
        .filter(col("sum_price") > 1000000)
        .orderBy(col("l_suppkey"))),

    // G-row extensions: lag/lead analytics (raw doubles — exact).
    "window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // F-row extensions: string scalar functions.
    "scalar_string_funcs" -> ((s, d) =>
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_name"), 1, 4).as("prefix"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"),
          length(col("p_name")).cast("long").as("name_len"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded"))
        .orderBy(col("p_partkey"))),

    // F-row extensions: array scalar functions (the ClickHouse
    // arrayMap/arrayFilter/arraySum family) as codegen'd higher-order
    // functions over per-order quantity lists. The collected arrays are
    // per-ORDER (bounded ~7 elements), the fold order is pinned by
    // sort_array on (linenumber, quantity) — (orderkey, linenumber) is
    // NOT unique in the synthetic data — so both engines sum the same
    // doubles in the same order.
    "scalar_array_hofs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 2000)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(struct(col("l_linenumber"),
          col("l_quantity")))).as("sl"))
        .select(col("l_orderkey"),
          transform(col("sl"), x => x.getField("l_quantity"))
            .as("qtys"))
        .select(col("l_orderkey"),
          size(col("qtys")).cast("long").as("n_items"),
          round(aggregate(transform(col("qtys"), q => q * 2),
            lit(0.0), (acc, x) => acc + x), 1).as("double_qty_sum"),
          size(filter(col("qtys"), q => q > 25)).cast("long")
            .as("n_large"))
        .orderBy(col("l_orderkey"))),

    // F-row extensions: date-part extraction rollup.
    "scalar_date_parts" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(
          year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("y"), col("q"), col("m"))),

    // Approximate sketches (HLL++ distinct, quantile summaries) — the
    // at-scale substitutes for exact distinct/percentile. Rows-only
    // (sketch algorithms differ across engines; accuracy is pinned by
    // SketchSpec against exact values instead).
    "agg_approx_sketches" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_orderkey"), 0.02)
            .as("approx_orders"),
          approx_count_distinct(col("l_partkey"), 0.02)
            .as("approx_parts"),
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("p50_price"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(10000))
            .as("p95_price"))
        .orderBy(col("l_returnflag"))),

    // ROLLUP (hierarchical grouping sets; CUBE covered elsewhere).
    "agg_rollup_time" -> ((s, d) =>
      Tables.orders(s, d)
        .rollup(year(col("o_orderdate")).as("y"),
          quarter(col("o_orderdate")).as("q"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("q"), lit(-1)).as("q"), col("n"))
        .orderBy(col("y"), col("q"))),

    // Ranking-family windows: dense_rank, percent_rank, ntile.
    "window_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          ntile(4).over(w).cast("long").as("quartile"))
        .filter(col("drank") <= 50)
        .orderBy(col("o_orderpriority"), col("drank"), col("o_orderkey"))
    }),

    // Mergeable aggregate states (AggregatingMergeTree analog, see
    // agg.SketchStore): per-(day, type) HLL states of user_id, unioned
    // per type and finalized — distinct counts re-aggregated from
    // O(lgK) states, never by adding estimates. Rows-only (sketch
    // binary layout is engine-specific); exactness at these
    // cardinalities is pinned by SketchStoreSpec.
    "agg_hll_state_rollup" -> ((s, d) => {
      val states = graft.Tables.events(s, d)
        .groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("state"))
      states.groupBy(col("event_type"))
        .agg(hll_sketch_estimate(
          hll_union_agg(col("state"), lit(false)))
          .as("distinct_users"))
        .orderBy(col("event_type"))
    }),

    // Mergeable QUANTILE states (the quantileState twin of the HLL
    // rollup above, completing the AggregatingMergeTree family — see
    // agg.QuantileState/QuantileStore): per-(returnflag, linestatus)
    // GK summaries of l_extendedprice, unioned per returnflag and
    // finalized — order statistics re-aggregated from O(1/eps) states,
    // never by combining per-group quantiles (which has no correct
    // combination rule). Rows-only (state layout is engine-specific);
    // rank-error accuracy and merge lawfulness pinned by
    // QuantileStoreSpec.
    "agg_quantile_state_rollup" -> ((s, d) => {
      val states = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.agg.QuantileState.stateAgg(
          col("l_extendedprice"), 0.001).as("qstate"))
      states.groupBy(col("l_returnflag"))
        .agg(graft.agg.QuantileState.mergeAgg(col("qstate"))
          .as("qstate"))
        .select(col("l_returnflag"),
          round(graft.agg.QuantileState.value(col("qstate"), 0.5), 2)
            .as("p50_price"),
          round(graft.agg.QuantileState.value(col("qstate"), 0.9), 2)
            .as("p90_price"),
          round(graft.agg.QuantileState.value(col("qstate"), 0.99), 2)
            .as("p99_price"))
        .orderBy(col("l_returnflag"))
    }),

    // Mergeable FREQUENCY states (Count-Min), same shape as the
    // quantile rollup above: states built per fine key, rolled up to
    // the coarse key by the sketch's own (elementwise-exact) merge,
    // then probed for fixed part keys. HASH-GATED since round 13:
    // unlike GK (order-dependent) and DataSketches HLL (library
    // internals), every CMS operation is deterministic integer
    // arithmetic over replayable hashes, so the DuckDB oracle
    // recomputes xxhash64(long) + splitmix64 slots + min-of-sums
    // independently (cmsOracleSql below); accuracy, merge exactness,
    // and store replay remain pinned by CountMinSpec /
    // CountMinStoreSpec.
    "agg_cms_state_rollup" -> ((s, d) => {
      val states = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(graft.agg.CountMinState.stateAgg(
          col("l_partkey"), 4, 2048).as("cms"))
      val merged = states.groupBy(col("l_returnflag"))
        .agg(graft.agg.CountMinState.mergeAgg(col("cms")).as("cms"))
      val probes = (1L to 5L).map(lit)
      merged.select(col("l_returnflag") +:
          probes.zipWithIndex.map { case (p, i) =>
            graft.agg.CountMinState.value(col("cms"), p)
              .as(s"freq_part_${i + 1}")
          }: _*)
        .orderBy(col("l_returnflag"))
    }),

    // Exact order statistics (the non-approx counterpart of
    // agg_approx_sketches): median + interpolated percentile.
    "agg_exact_median" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(median(col("l_quantity")), 2).as("med_qty"),
          round(percentile(col("l_extendedprice"), lit(0.25)), 2)
            .as("p25_price"),
          round(percentile(col("l_extendedprice"), lit(0.75)), 2)
            .as("p75_price"))
        .orderBy(col("l_returnflag"))),

    // Ordered string aggregation (collect_list -> sort -> join; the
    // string_agg/group_concat operator).
    "agg_string_concat" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 50)
        .groupBy(col("l_orderkey"))
        .agg(array_join(array_sort(collect_list(
          col("l_linenumber").cast("string"))), ",").as("lines"))
        .orderBy(col("l_orderkey"))),

    // Statistical aggregates: sample stddev/variance + correlation
    // (small-magnitude columns so 4-decimal rounding is FP-safe).
    "agg_stats_funcs" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(var_samp(col("l_discount")), 4).as("var_disc"),
          round(corr(col("l_quantity"), col("l_discount")), 4)
            .as("corr_qd"))
        .orderBy(col("l_returnflag"))),

    // Value-family windows: first/last/nth over an explicit full-frame
    // (UNBOUNDED..UNBOUNDED — last_value over the default frame is the
    // classic running-value trap).
    "window_value_family" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("last_price"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // RANGE frame: cumulative revenue per priority including ties at
    // the same price (decimal accumulation — order-independent, unlike
    // a double sum over an unordered tie group).
    "window_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(sum(dec2(col("o_totalprice"))).over(w), 2)
            .cast("double").as("cum_price"))
        .orderBy(col("o_orderpriority"), col("cum_price"),
          col("o_orderkey"))
    }),

    // GROUPING SETS beyond ROLLUP/CUBE: two independent 1-D slices
    // plus the grand total in one pass.
    "agg_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        // pre-project the computed key: groupingSets matches grouping
        // columns by expression, and an alias inside the set list
        // breaks that match (the slice's key comes out null)
        .withColumn("y", year(col("o_orderdate")))
        .groupingSets(
          Seq(Seq(col("y")), Seq(col("o_orderpriority")), Seq()),
          col("y"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .select(coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("prio"),
          col("n"))
        .orderBy(col("y"), col("prio"))),

    // Cross join (the one join shape left): region x nation grid.
    "join_cross_dims" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select(col("r_name"), col("n_name"))
        .orderBy(col("r_name"), col("n_name"))),

    // Bloom-filter runtime pre-filter ahead of an exact semi join (see
    // ops/BloomPrune — the explicit twin of AQE's runtime filter): the
    // fact scan probes a broadcast bloom of the selective order-key
    // set inside codegen, so only might-match rows reach the join's
    // shuffle. Exact despite the approximate filter (false positives
    // die in the semi join; false negatives impossible) — oracle = a
    // plain EXISTS.
    "join_bloom_prune" -> ((s, d) =>
      graft.ops.BloomPrune.semiJoin(Tables.lineitem(s, d),
          col("l_orderkey"),
          Tables.orders(s, d).filter(col("o_totalprice") > 400000),
          "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"),
          round(sum(dec2(col("l_extendedprice"))), 2).cast("double")
            .as("sum_price"))
        .orderBy(col("l_returnflag"))),

    // Conditional-aggregate combinators (the ClickHouse -If family:
    // countIf / sumIf / avgIf, kafka+clickhouse.md:240-243's rollup
    // idiom generalized): one pass over events, every branch map-side
    // combined — the at-scale replacement for N filtered subqueries
    // (one scan instead of N). Null-empty branches are coalesced so
    // both engines agree when a day has no matching rows.
    "agg_conditional_if" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"),
          count_if(col("event_type") === "click").as("n_clicks"),
          count_if(col("event_type") === "purchase").as("n_purchases"),
          round(coalesce(sum(when(col("event_type") === "purchase",
            col("value"))), lit(0.0)), 2).as("purchase_value"),
          round(coalesce(avg(when(col("event_type") === "view",
            col("value"))), lit(-1.0)), 2).as("avg_view_value"))
        .orderBy(col("day"))),

    // Multi-quantile in one pass (ClickHouse quantilesExact analog):
    // nearest-rank quantiles — the value at rank ceil(p*n) — NOT
    // interpolated. Deliberate: linearly-interpolated percentiles
    // disagree across engines in the last ulp ((a+b)/2 here vs
    // a+(b-a)*f there), and sf0.001 landed one exactly on a .xx5
    // rounding boundary. Nearest-rank outputs are actual data values,
    // and ceil(p*n) is ONE IEEE multiply both engines compute
    // bit-identically — no FP seam at any scale. Interpolated
    // percentiles stay pinned by agg_exact_median (off-boundary).
    // Round 14: the one-window formulation (row_number + count over
    // partition(l_returnflag) — THREE flag values, so a whole flag's
    // lineitem rows through one task at scale) became a two-phase
    // rank locate: (1) per-(flag, price-bucket) counts, bucket =
    // price cast long >> 6 — monotone for the positive TPC-H price
    // domain, so buckets are contiguous price ranges and the subtotal
    // frame is bounded by the VALUE domain, not the corpus; (2)
    // exclusive prefix + per-flag n over the bounded frame; (3) each
    // target rank ceil(n*p) — the SAME single IEEE multiply as before
    // — locates its bucket (off < r <= off+cnt), and ONLY rows of
    // target buckets are ranked, windowed on (flag, bucket, quantile)
    // so a bucket serving two quantiles ranks each copy
    // independently. Ties share a value and can never span a bucket
    // (equal price -> equal bucket), so the selected values are
    // bit-identical to the global-rank formulation.
    // RESIDUAL SKEW (round-14 ADVICE): stage (3)'s within-bucket
    // window partitions are still corpus-PROPORTIONAL — the 64-unit
    // buckets give a FIXED ~1600-bucket domain over the TPC-H price
    // range, so one target bucket holds O(corpus/1600) rows through
    // one task. That is a constant-factor bound (1/1600th of a flag's
    // rows, vs the whole flag before the rework), not the
    // corpus-independent bound the heap family gives. A deployment
    // where even corpus/1600 overflows a task derives the shift from
    // a row budget instead of a fixed width: bucketShift =
    // floor(log2(maxPrice * nFlags / targetRowsPerBucket)) — halving
    // the width doubles the (still value-domain-bounded) subtotal
    // frame and halves the final stage's partition, so the knob
    // trades stage-(2) frame size against stage-(3) skew without
    // touching result values (the tie argument above is
    // width-independent).
    "agg_quantiles_multi" -> ((s, d) => {
      val priced = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .withColumn("qb",
          shiftright(col("l_extendedprice").cast("long"), 6))
      val counts = priced.groupBy(col("l_returnflag"), col("qb"))
        .agg(count(lit(1)).as("cnt"))
      val wOff = Window.partitionBy(col("l_returnflag")).orderBy(col("qb"))
      val offs = counts
        .withColumn("off", coalesce(sum(col("cnt")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("n", sum(col("cnt"))
          .over(Window.partitionBy(col("l_returnflag"))))
      // one pass over the bounded offset frame for all three targets
      // (a per-quantile filter union re-aggregated the counts thrice)
      val marks = offs
        .select(col("l_returnflag"), col("qb"), col("off"), col("cnt"),
          explode(array(Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99)
            .map { case (nm, p) =>
              struct(lit(nm).as("q_name"),
                ceil(col("n") * p).as("r"))
            }: _*)).as("t"))
        .filter(col("off") < col("t.r") &&
          col("t.r") <= col("off") + col("cnt"))
        .select(col("l_returnflag"), col("qb"),
          col("t.q_name").as("q_name"),
          (col("t.r") - col("off")).as("local_rn"))
      val wIn = Window
        .partitionBy(col("l_returnflag"), col("qb"), col("q_name"))
        .orderBy(col("l_extendedprice"))
      priced.join(broadcast(marks), Seq("l_returnflag", "qb"))
        .withColumn("lrn", row_number().over(wIn))
        .filter(col("lrn") === col("local_rn"))
        .groupBy(col("l_returnflag"))
        .agg(
          max(when(col("q_name") === "p50", col("l_extendedprice")))
            .as("p50"),
          max(when(col("q_name") === "p90", col("l_extendedprice")))
            .as("p90"),
          max(when(col("q_name") === "p99", col("l_extendedprice")))
            .as("p99"))
        .orderBy(col("l_returnflag"))
    }),

    // Bounded-state distinct counting (ClickHouse uniqUpTo analog; see
    // ops/UniqUpTo): per order, the exact supplier count when <= 3 and
    // 4 ("more than 3") once it isn't. Groups straddle the threshold
    // at every sf (sf0.01: 1137/2216/3033 orders at 1/2/3 suppliers,
    // 8357 saturated), so both regimes are exercised; per-task state
    // caps at 4 longs per order vs countDistinct's distinct-value-
    // proportional Expand+shuffle.
    "agg_uniq_upto" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(graft.ops.UniqUpTo.uniqUpTo(col("l_suppkey"), 3)
          .as("supp_upto3"))
        .orderBy(col("l_orderkey"))),

    // Dictionary lookup (ClickHouse dictGet analog; see ops/Dict): the
    // 25-row nation table is compiled into a literal in-plan map, so
    // enriching supplier rows is a scalar projection — NO join
    // operator, no exchange of any kind (DictSpec asserts the
    // join-free plan). Unknown keys fall back via dictGetOrDefault.
    "dict_get_nation" -> ((s, d) => {
      val nations = graft.ops.Dict.fromTable(Tables.nation(s, d),
        "n_nationkey", "n_name")
      Tables.supplier(s, d)
        .select(col("s_suppkey"), col("s_name"),
          graft.ops.Dict.getOrDefault(nations, col("s_nationkey"),
            lit("UNKNOWN")).as("nation"))
        .orderBy(col("s_suppkey"))
    }),

    // Per-source corpus profile: the data-quality summary a pipeline
    // computes before training (volumes, language spread, emptiness,
    // char-length stats) — one pass, all aggregates map-side combined.
    "corpus_profile" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(when(col("text").isNull ||
            length(trim(col("text"))) === 0, 1L).otherwise(0L))
            .as("n_empty"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          round(avg(dec2(col("n_chars"))), 2).cast("double")
            .as("avg_chars"))
        .orderBy(col("source")))
  )

  /** DuckDB replay of the Count-Min rollup (the round-13 sketch-state
    * conversion to hash-gated): per-key xxHash64(seed 42) of the LONG
    * key ([[SqlU64.hashLong]] — the same canonicalization
    * `CountMinState.hashed` applies), row remix via splitmix64 of
    * `h + i * GoldenGamma`, power-of-two slot (unsigned mod 2048 ==
    * Java floorMod on the signed value), and the point estimate as
    * the min over rows of the exact integer collision-count sums.
    * Building per-(rf, ls) then merging per rf is elementwise
    * addition, so the replay builds per rf directly — identical
    * counters by associativity. Static SQL: the hash is over LONGs,
    * every operation is total, no corpus-side guard needed. */
  private def cmsOracleSql: String = {
    import SqlU64._
    val gg = "11400714819323198485::UHUGEINT" // 0x9E3779B97F4A7C15
    def slot(h: String, i: String) =
      s"(${splitmix64(add(h, mul(i, gg)))} % 2048::UHUGEINT)"
    val probeCols = (1 to 5).map { k =>
      s"  max(CASE WHEN probe = $k THEN e END)::BIGINT AS freq_part_$k"
    }.mkString(",\n")
    s"""WITH pk AS (SELECT l_returnflag, l_partkey, count(*) AS cnt
       |            FROM lineitem GROUP BY 1, 2),
       |keys AS (SELECT DISTINCT l_partkey AS v FROM lineitem
       |         UNION SELECT unnest(range(1, 6)) AS v),
       |kh AS (SELECT x.v, ${hashLong("x.v")} AS h FROM keys x),
       |r AS (SELECT unnest(range(4)) AS i),
       |ks AS (SELECT kh.v, r.i, ${slot("kh.h", "r.i::UHUGEINT")} AS s
       |       FROM kh, r),
       |m AS (SELECT pk.l_returnflag, b.v AS probe, a.i,
       |        sum(CASE WHEN a.s = b.s THEN pk.cnt ELSE 0 END) AS c
       |      FROM pk JOIN ks a ON a.v = pk.l_partkey
       |        JOIN (SELECT * FROM ks WHERE v BETWEEN 1 AND 5) b
       |          ON b.i = a.i
       |      GROUP BY 1, 2, 3),
       |est AS (SELECT l_returnflag, probe, min(c) AS e FROM m
       |        GROUP BY 1, 2)
       |SELECT l_returnflag,
       |$probeCols
       |FROM est GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "agg_cms_state_rollup" -> cmsOracleSql,
    "join_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n_items,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
        |   AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_orderkey = l_orderkey AND o_totalprice > 400000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_conditional_if" ->
      """SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  count(*) AS n_events,
        |  count(*) FILTER (WHERE event_type = 'click') AS n_clicks,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'),
        |    0.0), 2) AS purchase_value,
        |  round(coalesce(avg(value) FILTER (WHERE event_type = 'view'),
        |    -1.0), 2) AS avg_view_value
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_quantiles_multi" ->
      """WITH r AS (SELECT l_returnflag, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  max(CASE WHEN rn = ceil(n * 0.5) THEN l_extendedprice END)
        |    AS p50,
        |  max(CASE WHEN rn = ceil(n * 0.9) THEN l_extendedprice END)
        |    AS p90,
        |  max(CASE WHEN rn = ceil(n * 0.99) THEN l_extendedprice END)
        |    AS p99
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    // Exact twin: least(count(distinct), n+1) — the saturation point
    // is the only information uniqUpTo discards.
    "agg_uniq_upto" ->
      """SELECT l_orderkey,
        |  least(count(DISTINCT l_suppkey), 4) AS supp_upto3
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "dict_get_nation" ->
      """SELECT s_suppkey, s_name,
        |  coalesce(n_name, 'UNKNOWN') AS nation
        |FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
        |ORDER BY s_suppkey""".stripMargin,
    "pred_in_like_range" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  AND o_totalprice BETWEEN 50000 AND 200000
        |  AND (o_orderstatus = 'F' OR o_orderstatus NOT IN ('P'))
        |  AND c_name LIKE 'Customer#0000000%'
        |ORDER BY o_orderkey""".stripMargin,
    "join_full_outer" ->
      """SELECT coalesce(o_custkey, c_custkey) AS custkey,
        | coalesce(n_orders, 0) AS n_orders,
        | coalesce(c_acctbal, -1.0) AS acctbal
        |FROM (SELECT o_custkey, count(*) AS n_orders FROM orders
        |      GROUP BY 1) co
        |FULL OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer
        |      WHERE c_acctbal > 9000) ri
        |  ON co.o_custkey = ri.c_custkey
        |ORDER BY custkey""".stripMargin,
    "join_left_outer" ->
      """SELECT c_custkey, count(o_orderkey) AS n_big_orders
        |FROM customer LEFT OUTER JOIN (
        |  SELECT * FROM orders WHERE o_totalprice > 400000) o
        |  ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_minmax_having" ->
      """SELECT l_suppkey, min(l_quantity) AS min_qty,
        | max(l_quantity) AS max_qty,
        | CAST(round(avg(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
        |   AS avg_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
        |   AS DOUBLE) AS sum_price
        |FROM lineitem GROUP BY 1
        |HAVING CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
        |   AS DOUBLE) > 1000000
        |ORDER BY 1""".stripMargin,
    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        | lag(o_totalprice, 1) OVER w AS prev_price,
        | lead(o_totalprice, 1) OVER w AS next_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "scalar_string_funcs" ->
      """SELECT p_partkey, upper(p_name) AS uname,
        | substring(p_name, 1, 4) AS prefix,
        | p_brand || '/' || p_type AS brand_type,
        | regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
        | length(p_name) AS name_len,
        | lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded
        |FROM part ORDER BY p_partkey""".stripMargin,
    "scalar_array_hofs" ->
      """WITH a AS (SELECT l_orderkey,
        |    list(l_quantity ORDER BY l_linenumber, l_quantity) AS qtys
        |  FROM lineitem WHERE l_orderkey <= 2000 GROUP BY 1)
        |SELECT l_orderkey, len(qtys) AS n_items,
        |  round(list_sum(list_transform(qtys, q -> q * 2)), 1)
        |    AS double_qty_sum,
        |  len(list_filter(qtys, q -> q > 25)) AS n_large
        |FROM a ORDER BY l_orderkey""".stripMargin,
    "scalar_date_parts" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y,
        | CAST(quarter(o_orderdate) AS INT) AS q,
        | CAST(month(o_orderdate) AS INT) AS m, count(*) AS n
        |FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "join_cross_dims" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin,
    "agg_rollup_time" ->
      """SELECT coalesce(CAST(year(o_orderdate) AS INT), -1) AS y,
        | coalesce(CAST(quarter(o_orderdate) AS INT), -1) AS q,
        | count(*) AS n
        |FROM orders
        |GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate))
        |ORDER BY 1, 2""".stripMargin,
    "agg_exact_median" ->
      """SELECT l_returnflag, round(median(l_quantity), 2) AS med_qty,
        | round(quantile_cont(l_extendedprice, 0.25), 2) AS p25_price,
        | round(quantile_cont(l_extendedprice, 0.75), 2) AS p75_price
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_string_concat" ->
      """SELECT l_orderkey,
        | string_agg(CAST(l_linenumber AS VARCHAR), ','
        |   ORDER BY CAST(l_linenumber AS VARCHAR)) AS lines
        |FROM lineitem WHERE l_orderkey <= 50
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "agg_stats_funcs" ->
      """SELECT l_returnflag,
        | round(stddev_samp(l_quantity), 4) AS sd_qty,
        | round(var_samp(l_discount), 4) AS var_disc,
        | round(corr(l_quantity, l_discount), 4) AS corr_qd
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_value_family" ->
      """SELECT o_custkey, o_orderkey,
        | first_value(o_totalprice) OVER w AS first_price,
        | last_value(o_totalprice) OVER w AS last_price,
        | nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "window_range_frame" ->
      """SELECT o_orderpriority, o_orderkey,
        | CAST(round(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER w, 2)
        |   AS DOUBLE) AS cum_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |  RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderpriority, cum_price, o_orderkey""".stripMargin,
    "agg_grouping_sets" ->
      """SELECT coalesce(CAST(year(o_orderdate) AS INT), -1) AS y,
        | coalesce(o_orderpriority, 'ALL') AS prio, count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((year(o_orderdate)),
        |  (o_orderpriority), ())
        |ORDER BY 1, 2""".stripMargin,
    "corpus_profile" ->
      """SELECT source, count(*) AS n_docs,
        | count(DISTINCT lang) AS n_langs,
        | CAST(sum(CASE WHEN text IS NULL OR length(trim(text)) = 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
        | min(n_chars) AS min_chars, max(n_chars) AS max_chars,
        | CAST(round(avg(CAST(n_chars AS DECIMAL(12,2))), 2) AS DOUBLE)
        |   AS avg_chars
        |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "window_rank_family" ->
      """SELECT o_orderpriority, o_orderkey,
        | dense_rank() OVER w AS drank,
        | round(percent_rank() OVER w, 6) AS prank,
        | ntile(4) OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |QUALIFY drank <= 50
        |ORDER BY o_orderpriority, drank, o_orderkey""".stripMargin
  )
}
