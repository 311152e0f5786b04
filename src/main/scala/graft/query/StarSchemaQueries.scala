package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** North-star query surface over the TPC-H-ish star schema — fills the
  * operator categories the reference demonstrably lacks (SURVEY.md §2
  * D/G absence rows): joins of every flavor, window functions, set
  * operations, LIMIT/top-k, distinct + grouping-set aggregation.
  *
  * Scale stance (100 TB design point): dimension tables (region, nation,
  * supplier, customer, part) are explicitly `broadcast()` so the big
  * fact-side scans never shuffle for them; only fact-fact joins
  * (orders<->lineitem) use a shuffle, on their natural key. Aggregations
  * are declarative groupBys -> Catalyst plans partial/final hash aggs
  * with map-side combine; AQE handles skew/partition sizing at runtime.
  *
  * Determinism for the oracle compare: every double aggregate is rounded
  * on both sides, every query ends in a total ORDER BY over output
  * columns (keys break ties), temporal outputs are cast to string.
  */
object StarSchemaQueries {

  /** Exact money arithmetic for oracle parity. Two distinct hazards,
    * both observed as last-cent mismatches vs DuckDB at sf0.01:
    *  1. double SUM accumulation order differs between engines -> sum in
    *     DECIMAL (integer arithmetic, order-independent);
    *  2. casting a double *product* to decimal rounds differently (Spark
    *     rounds the exact binary value, DuckDB a scaled double) -> cast
    *     each clean-decimal FACTOR (prices .2f, rates .2f) to decimal
    *     first and multiply exactly, so no engine ever rounds a product.
    */
  private def dec(c: org.apache.spark.sql.Column, t: String = "decimal(12,2)") =
    c.cast(t)
  private def revenue =
    dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(6,4)") - dec(col("l_discount"), "decimal(6,4)"))
  private def charge =
    revenue * (lit(1).cast("decimal(6,4)") +
      dec(col("l_tax"), "decimal(6,4)"))
  private def moneySum(c: org.apache.spark.sql.Column) =
    round(sum(c), 2).cast("double")
  private def moneyAvg(c: org.apache.spark.sql.Column) =
    round(avg(c), 2).cast("double")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: the canonical scan->filter->multi-agg rollup.
    "q1_pricing_summary" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-01")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          moneySum(dec(col("l_quantity"))).as("sum_qty"),
          moneySum(dec(col("l_extendedprice"))).as("sum_base_price"),
          moneySum(revenue).as("sum_disc_price"),
          moneySum(charge).as("sum_charge"),
          moneyAvg(dec(col("l_quantity"))).as("avg_qty"),
          moneyAvg(dec(col("l_extendedprice"))).as("avg_price"),
          moneyAvg(dec(col("l_discount"), "decimal(6,4)")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),

    // TPC-H Q6 shape: the canonical highly-selective scan-and-sum —
    // every predicate pushes to the parquet scan, the aggregate is one
    // map-side-combined decimal sum (discount factors multiplied in
    // exact decimals per the money rules above).
    "q6_forecast_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")) &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(round(sum(dec(col("l_extendedprice")) *
          dec(col("l_discount"), "decimal(6,4)")), 2).cast("double")
          .as("revenue"))),

    // TPC-H Q4 shape (adapted: this schema has no commit/receipt
    // dates, so "late" = a line shipped more than 90 days after the
    // order date): EXISTS against the fact table, counted per
    // priority. The semi join carries the non-equi lateness predicate.
    "q4_priority_checking" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1997-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr("INTERVAL 90 DAYS"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q14 shape: promotion revenue share — broadcast part dim,
    // conditional decimal sums, one final double division (both
    // operands are exact decimal sums cast to double, so the division
    // and rounding are bit-identical across engines).
    "q14_promo_effect" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1997-07-01")))
      li.join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .agg(
          round(lit(100.0) *
            sum(when(col("p_type") === "PROMO", revenue)
              .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
            sum(revenue).cast("double"), 4).as("promo_pct"),
          round(sum(revenue), 2).cast("double").as("total_revenue"))
    }),

    // TPC-H Q3 shape: dim-filtered 3-way join + top-k by aggregate.
    // customer is broadcast (dim); orders<->lineitem shuffle on orderkey.
    "q3_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit("1996-07-01")))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > to_timestamp(lit("1996-07-01")))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"),
          col("o_orderdate").cast("string").as("o_orderdate"))
        .agg(moneySum(revenue).as("rev"))
        .orderBy(col("rev").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-way star join, all dims broadcast.
    "q5_regional_revenue" -> ((s, d) => {
      val r = Tables.region(s, d)
      val n = Tables.nation(s, d)
      val sup = Tables.supplier(s, d)
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1995-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1997-01-01")))
      Tables.lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(moneySum(revenue).as("rev"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    }),

    // TPC-H Q10 shape: returned-item revenue per customer, top 20.
    "q10_returned_items" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      li.join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(moneySum(revenue).as("rev"))
        .orderBy(col("rev").desc, col("c_custkey"))
        .limit(20)
    }),

    // Semi join (EXISTS): orders having any near-max-quantity line.
    "join_semi_exists" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_semi")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Anti join (NOT EXISTS): orders with no such line.
    "join_anti_not_exists" -> ((s, d) =>
      Tables.orders(s, d)
        .join(Tables.lineitem(s, d).filter(col("l_quantity") > 49),
          col("o_orderkey") === col("l_orderkey"), "left_anti")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // Ranking window: top-3 orders per customer by price.
    "window_rank_topn" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Analytic window: per-supplier running revenue over ship order.
    // Explicit ROWS frame + total ordering keeps the double accumulation
    // order identical to the oracle's.
    "window_running_sum" -> ((s, d) => {
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
      // (duplicate keys with different prices exist at every sf), so the
      // ordering tie-breaks through the value columns — with them, even
      // fully identical rows yield a deterministic running-sum multiset
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("l_partkey"),
          col("l_extendedprice"), col("l_discount"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.lineitem(s, d)
        .withColumn("running_rev",
          round(sum(revenue).over(w), 2).cast("double"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          col("running_rev"))
        .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
    }),

    // Set ops (distinct semantics, matching SQL INTERSECT/EXCEPT/UNION).
    "setop_intersect" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey")).distinct()
        .intersect(o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey")).distinct())
        .orderBy(col("o_custkey"))
    }),
    "setop_except" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey")).distinct()
        .except(o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey")).distinct())
        .orderBy(col("o_custkey"))
    }),
    "setop_union" -> ((s, d) => {
      val o = Tables.orders(s, d)
      o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey"))
        .union(o.filter(year(col("o_orderdate")) === 1996)
          .select(col("o_custkey")))
        .distinct()
        .orderBy(col("o_custkey"))
    }),

    // Grouping sets: CUBE with distinct aggregates; grouping nulls
    // normalized to 'ALL' for stable compare.
    "agg_cube_distinct" -> ((s, d) =>
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_rows"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n_orders"), col("n_parts"), col("n_rows"))
        .orderBy(col("rf"), col("ls"))),

    // LIMIT / top-k on a raw column (exact doubles, no aggregation).
    "topk_limit" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
        .orderBy(col("p_retailprice").desc, col("p_partkey"))
        .limit(10)),

    // TPC-H Q13 shape: customer order-count DISTRIBUTION — left outer
    // join with a join-side (not where-side) filter, count per
    // customer, then re-group on the count itself. Adapted filter: the
    // schema has no o_comment, so the excluded class is a priority
    // band. The custkey shuffle carries the big join; the second
    // aggregate runs on at most (max orders per customer) rows.
    "q13_custdist" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_orderkey"), col("o_custkey"))
      Tables.customer(s, d)
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q15 shape: agg-over-agg via a revenue "view" — per-supplier
    // quarter revenue, then the suppliers achieving the MAX of that
    // aggregate. The equality is evaluated on the EXACT decimal sums
    // (never on rounded doubles), so both engines pick the same
    // winners; the 1-row max is broadcast, not a second shuffle.
    "q15_top_supplier" -> ((s, d) => {
      val rev = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1996-04-01")))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue).as("rev_dec"))
      val maxRev = rev.agg(max(col("rev_dec")).as("max_rev"))
      rev.join(broadcast(maxRev), col("rev_dec") === col("max_rev"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          round(col("rev_dec"), 2).cast("double").as("total_rev"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q18 shape: large-volume orders — semi join on a GROUPED
    // threshold (per-order quantity sum > 200). The quantity aggregate
    // is computed once and joined back (one orderkey shuffle reused by
    // the orders join), rather than TPC-H's textual IN-subquery +
    // re-aggregation, which would scan lineitem twice.
    "q18_large_orders" -> ((s, d) => {
      val bigOrders = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec(col("l_quantity"))).as("qty_dec"))
        .filter(col("qty_dec") > 200)
      bigOrders
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate").cast("string").as("o_orderdate"),
          col("o_totalprice"),
          round(col("qty_dec"), 2).cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q7 shape: bidirectional nation-pair trade volume by year —
    // the two-aliased-dimension join (the SAME nation table joined once
    // through the supplier and once through the customer). Both nation
    // copies broadcast; the one shuffle is lineitem<->orders.
    "q7_nation_volume" -> ((s, d) => {
      val nations = Seq("NATION_0", "NATION_1", "NATION_2", "NATION_3")
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"),
          col("n_name").as("cust_nation"))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate")
          .between(to_timestamp(lit("1995-01-01")),
            to_timestamp(lit("1996-12-31"))))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(col("supp_nation").isin(nations: _*) &&
          col("cust_nation").isin(nations: _*) &&
          col("supp_nation") =!= col("cust_nation"))
        // cast: Spark year() is INT, DuckDB's BIGINT — dtype-only FAIL
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(moneySum(revenue).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),

    // TPC-H Q8 shape: national market share — a conditional share of a
    // revenue sum over a 7-table star join (nation joined twice), the
    // numerator/denominator both exact decimal sums divided once in
    // double (same determinism discipline as q14).
    "q8_market_share" -> ((s, d) => {
      val n1 = Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"),
          col("n_regionkey").as("c_rk"))
      val n2 = Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"),
          col("n_name").as("supp_nation"))
      val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate")
            .between(to_timestamp(lit("1995-01-01")),
              to_timestamp(lit("1996-12-31")))),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_type") === "PROMO")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.customer(s, d)),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(n1), col("c_nationkey") === col("c_nk"))
        .join(broadcast(asia), col("c_rk") === col("r_regionkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          round(sum(when(col("supp_nation") === "NATION_1", revenue)
            .otherwise(lit(0).cast("decimal(12,2)"))).cast("double") /
            sum(revenue).cast("double"), 4).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_year"))
    }),

    // TPC-H Q17 shape: correlated per-group scalar aggregate — lines
    // far below their part's average order quantity. The per-part
    // average is computed once and joined back (the decorrelated plan
    // Catalyst would also produce); computed as exact-sum/count so both
    // engines derive the identical double threshold.
    "q17_small_qty_revenue" -> ((s, d) => {
      val branded = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") === "Brand#3")),
          col("l_partkey") === col("p_partkey"))
      val avgQty = branded.groupBy(col("l_partkey").as("pk"))
        .agg((sum(col("l_quantity")) / count(lit(1))).as("avg_qty"))
      branded.join(avgQty, col("l_partkey") === col("pk"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(
          round(sum(dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
            .as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q19 shape: disjunctive predicate bundles spanning BOTH join
    // sides (brand x size x quantity) — the OR cannot push below the
    // join, but each bundle's part-side half prunes the broadcast dim.
    "q19_bundle_revenue" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
            col("l_quantity").between(20, 30)))
        .agg(moneySum(revenue).as("revenue"),
          count(lit(1)).as("n_lines"))),

    // TPC-H Q22 shape: anti join + global scalar threshold — rich
    // (above positive-average balance) customers with no recent orders,
    // per nation. The schema has no c_phone, so nations stand in for
    // the phone country codes; "dormant" = no order since 1999. The
    // threshold is an exact decimal sum / count, broadcast as one row.
    "q22_dormant_customers" -> ((s, d) => {
      val thr = Tables.customer(s, d).filter(col("c_acctbal") > 0)
        .agg((sum(dec(col("c_acctbal"))).cast("double") /
          count(lit(1))).as("thr"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01")))
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .join(broadcast(thr))
        .filter(col("c_acctbal") > col("thr"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("numcust"),
          moneySum(dec(col("c_acctbal"))).as("totacctbal"))
        .orderBy(col("n_name"))
    }),

    // TPC-H Q21 shape: the multi-EXISTS anti pattern — suppliers who
    // were the ONLY late supplier on a finalized multi-supplier order
    // ("kept the order waiting"). Late = shipped >90 days after the
    // order date (same adaptation as q4: the schema has no
    // commit/receipt dates). One late-line set feeds both the EXISTS
    // (some other supplier on the order) semi join and the NOT EXISTS
    // (another late supplier) anti join; every join is keyed on
    // orderkey, supplier is broadcast.
    "q21_waiting_supplier" -> ((s, d) => {
      // Round-15 (optimization round; guide §2.1): the exists /
      // not-exists pair keeps its original join shape, but the late
      // tree (lineitem⋈orders) is STAGED — it used to execute twice,
      // once as the probe side and once re-derived as the anti join's
      // build side. Aggregate reformulations (per-order distinct-
      // supplier counts via countDistinct or min/max) were measured
      // 0.5-0.6 s SLOWER at sf0.1 than the original semi/anti pair
      // and were discarded; the only change that survived measurement
      // is executing the late tree once.
      val late = graft.scale.Staging.materialize(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey") &&
              col("l_shipdate") > col("o_orderdate") +
                expr("INTERVAL 90 DAYS"))
          .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")),
        "q21-late")
      val others = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
      val otherLate = late
        .select(col("ok").as("ok3"), col("sk").as("sk3")).distinct()
      late
        .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"),
          "left_semi")
        .join(otherLate,
          col("ok") === col("ok3") && col("sk") =!= col("sk3"),
          "left_anti")
        .join(broadcast(Tables.supplier(s, d)),
          col("sk") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(100)
    }),

    // TPC-H Q2 shape: correlated scalar-MIN subquery — the cheapest
    // offer per part, decorrelated as min-agg + join back on
    // (partkey, cost), exactly the plan Catalyst's subquery rewrite
    // would produce. "Supply" is the lineitem offer stream (this schema
    // has no partsupp); cost is the RAW stored price, so the equality
    // join-back compares bit-identical doubles — no arithmetic, no
    // rounding seam. All dims broadcast; the one shuffle is the
    // per-part min.
    "q2_min_cost_supplier" -> ((s, d) => {
      val supply = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
          .filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("l_partkey"), col("l_extendedprice").as("cost"),
          col("s_name"), col("s_acctbal"), col("n_name"))
      // Round-15 shape (optimization round; guide §2.1): the min-agg +
      // join-back executed the supply join tree TWICE (once per
      // branch; the before-plan carries 26 parquet scans). A per-part
      // MIN window computes the same filter in ONE pass over supply
      // with one exchange on l_partkey. The window partition is
      // corpus-SAFE: partition count grows with parts, rows per
      // partition are offers-per-part (flat in corpus size). The
      // cost == min comparison is the same bit-identical double
      // equality the join-back used — proven by the unchanged oracle.
      supply
        .withColumn("min_cost",
          min(col("cost")).over(Window.partitionBy(col("l_partkey"))))
        .filter(col("cost") === col("min_cost"))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_size").between(1, 15) &&
            col("p_type") === "STANDARD")),
          col("l_partkey") === col("p_partkey"))
        .select(col("s_acctbal"), col("s_name"), col("n_name"),
          col("p_partkey"), col("p_name"), col("cost"))
        .distinct()
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    }),

    // TPC-H Q9 shape: product-line profit by nation and year — the
    // widest star join grouped on two derived keys, with a SUBSTRING
    // part filter (LIKE '%red%') that cannot push to a dictionary
    // equality. Profit = revenue - supply cost; with no partsupp,
    // supply cost is stood in by 10% of retail value — kept as exact
    // decimal factors so the per-row subtraction is order-independent.
    "q9_product_profit" -> ((s, d) => {
      val cost = dec(col("p_retailprice")) * dec(col("l_quantity")) *
        lit("0.10").cast("decimal(4,2)")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_name").like("%red%"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(moneySum(revenue - cost).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // TPC-H Q11 shape: HAVING against a GLOBAL scalar aggregate over
    // the same grouped view — per-part supply value (suppliers of one
    // nation) kept only where it exceeds a fraction of the total. The
    // total is a second aggregate over the per-part aggregate (tiny),
    // broadcast as one row; the threshold compare runs in double with
    // IDENTICAL IEEE steps on both engines (exact decimal sums cast
    // once, then one multiply).
    "q11_important_parts" -> ((s, d) => {
      val byPart = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_1")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(revenue).as("value_dec"))
      val thr = byPart
        .agg((sum(col("value_dec")).cast("double") * lit(0.001)).as("thr"))
      byPart.join(broadcast(thr))
        .filter(col("value_dec").cast("double") > col("thr"))
        .select(col("l_partkey"),
          round(col("value_dec"), 2).cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // TPC-H Q12 shape: late-line priority classification — a fact-fact
    // join carrying a non-equi lateness predicate (no commit/receipt
    // dates in this schema: late = shipped >60 days after order date),
    // then CONDITIONAL COUNTS split by priority class per line status.
    "q12_late_priority" -> ((s, d) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") +
              expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),

    // TPC-H Q16 shape: distinct-supplier counts per part spec with a
    // NOT-IN exclusion subquery (suppliers "with complaints" — stood in
    // by negative account balance). The exclusion set is tiny and
    // broadcast as an anti join; count(DISTINCT) runs per
    // (brand, type, size) after the broadcast dim join.
    "q16_supplier_spec_count" -> ((s, d) => {
      val complaints = Tables.supplier(s, d)
        .filter(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_sk"))
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(complaints),
          col("l_suppkey") === col("bad_sk"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // TPC-H Q20 shape: nested grouped-threshold SEMI join — suppliers
    // (of one nation) who shipped an outsized share of a 'red%' part's
    // 1997 volume. Two aggregations at different grain over one
    // filtered scan (per supplier-part, per part), joined on partkey;
    // the qualifying-supplier set is bounded by |supplier| and
    // broadcast into the final semi join.
    "q20_excess_supplier" -> ((s, d) => {
      val red97 = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01")) &&
          col("l_shipdate") < to_timestamp(lit("1998-01-01")))
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_name").like("red%"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_suppkey"), col("l_partkey"), col("l_quantity"))
      val perSuppPart = red97
        .groupBy(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
        .agg(sum(dec(col("l_quantity"))).as("qty97"))
      val perPart = red97.groupBy(col("l_partkey").as("pk2"))
        .agg((sum(dec(col("l_quantity"))).cast("double") * lit(0.3))
          .as("thr"))
      val excess = perSuppPart
        .join(perPart, col("pk") === col("pk2"))
        .filter(col("qty97").cast("double") > col("thr"))
        .select(col("sk")).distinct()
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .filter(col("n_name") === "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(excess), col("s_suppkey") === col("sk"),
          "left_semi")
        .select(col("s_name"), col("s_acctbal"))
        .orderBy(col("s_name"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q4_priority_checking" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o.o_orderkey
        |      AND l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q14_promo_effect" ->
      """SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(6,4)))
        |    ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE), 4)
        |  AS promo_pct,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
        |  AS total_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-07-01'""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(round(sum(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
        |   AS sum_qty,
        | CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
        |   AS DOUBLE) AS sum_base_price,
        | CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))))), 2) AS DOUBLE) AS sum_disc_price,
        | CAST(round(sum(((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4)))) * (1 + CAST(l_tax AS DECIMAL(6,4))))), 2) AS DOUBLE) AS sum_charge,
        | CAST(round(avg(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
        |   AS avg_qty,
        | CAST(round(avg(CAST(l_extendedprice AS DECIMAL(12,2))), 2)
        |   AS DOUBLE) AS avg_price,
        | CAST(round(avg(CAST(l_discount AS DECIMAL(6,4))), 2) AS DOUBLE)
        |   AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey, CAST(o_orderdate AS VARCHAR) AS o_orderdate,
        | CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))))), 2) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1996-07-01'
        |  AND l_shipdate > TIMESTAMP '1996-07-01'
        |GROUP BY 1, 2 ORDER BY rev DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_regional_revenue" ->
      """SELECT r_name, n_name,
        | CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))))), 2) AS DOUBLE) AS rev,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        | CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))))), 2) AS DOUBLE) AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin,
    "join_semi_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "join_anti_not_exists" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |  WHERE l_orderkey = o_orderkey AND l_quantity > 49)
        |ORDER BY o_orderkey""".stripMargin,
    "window_rank_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "window_running_sum" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        | CAST(round(sum((CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(6,4))))) OVER (
        |   PARTITION BY l_suppkey
        |   ORDER BY l_shipdate, l_orderkey, l_linenumber, l_partkey,
        |     l_extendedprice, l_discount
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
        |  AS DOUBLE) AS running_rev
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "setop_intersect" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "setop_except" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "setop_union" ->
      """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |UNION
        |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |ORDER BY o_custkey""".stripMargin,
    "agg_cube_distinct" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf,
        | coalesce(l_linestatus, 'ALL') AS ls,
        | count(DISTINCT l_orderkey) AS n_orders,
        | count(DISTINCT l_partkey) AS n_parts,
        | count(*) AS n_rows
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "topk_limit" ->
      """SELECT p_partkey, p_name, p_retailprice FROM part
        |ORDER BY p_retailprice DESC, p_partkey LIMIT 10""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(6,4)))) AS rev_dec
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name,
        |  CAST(round(rev_dec, 2) AS DOUBLE) AS total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE rev_dec = (SELECT max(rev_dec) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty_dec
        |  FROM lineitem GROUP BY 1 HAVING qty_dec > 200)
        |SELECT c_custkey, c_name, o_orderkey,
        |  CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_totalprice,
        |  CAST(round(qty_dec, 2) AS DOUBLE) AS sum_qty
        |FROM big
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  year(l_shipdate) AS l_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
        |    AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n2.n_name IN ('NATION_0','NATION_1','NATION_2','NATION_3')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01'
        |    AND TIMESTAMP '1996-12-31'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT year(o_orderdate) AS o_year,
        |  round(CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
        |      THEN CAST(l_extendedprice AS DECIMAL(12,2)) *
        |        (1 - CAST(l_discount AS DECIMAL(6,4)))
        |      ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) /
        |    CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE), 4)
        |    AS mkt_share,
        |  count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |JOIN region ON n1.n_regionkey = r_regionkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        |  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01'
        |    AND TIMESTAMP '1996-12-31'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_small_qty_revenue" ->
      """WITH pa AS (
        |  SELECT l_partkey AS pk, sum(l_quantity) / count(*) AS avg_qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_brand = 'Brand#3' GROUP BY 1)
        |SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)))
        |    AS DOUBLE) / 7.0, 2) AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN pa ON l_partkey = pk
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,
    "q19_bundle_revenue" ->
      """SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |    (1 - CAST(l_discount AS DECIMAL(6,4)))), 2) AS DOUBLE)
        |    AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
        |    AND l_quantity BETWEEN 1 AND 11)
        |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
        |    AND l_quantity BETWEEN 10 AND 20)
        |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
        |    AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q22_dormant_customers" ->
      """WITH thr AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
        |    / count(*) AS t
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT n_name, count(*) AS numcust,
        |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
        |    AS totacctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey, thr
        |WHERE c_acctbal > t
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_waiting_supplier" ->
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,
    "q2_min_cost_supplier" ->
      """WITH supply AS (
        |  SELECT l_partkey, l_extendedprice AS cost, s_name, s_acctbal,
        |    n_name
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |mc AS (SELECT l_partkey AS pk, min(cost) AS min_cost
        |  FROM supply GROUP BY 1)
        |SELECT DISTINCT s_acctbal, s_name, n_name, p_partkey, p_name,
        |  cost
        |FROM supply
        |JOIN mc ON l_partkey = pk AND cost = min_cost
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size BETWEEN 1 AND 15 AND p_type = 'STANDARD'
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      """SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(6,4))) -
        |    CAST(p_retailprice AS DECIMAL(12,2)) *
        |      CAST(l_quantity AS DECIMAL(12,2)) *
        |      CAST('0.10' AS DECIMAL(4,2))), 2) AS DOUBLE) AS sum_profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin,
    "q11_important_parts" ->
      """WITH bp AS (
        |  SELECT l_partkey,
        |    sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |      (1 - CAST(l_discount AS DECIMAL(6,4)))) AS value_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_1'
        |  GROUP BY 1)
        |SELECT l_partkey, CAST(round(value_dec, 2) AS DOUBLE) AS value
        |FROM bp
        |WHERE CAST(value_dec AS DOUBLE) >
        |  (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM bp)
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "q12_late_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_supplier_spec_count" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        |  AND l_suppkey NOT IN (
        |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_excess_supplier" ->
      """WITH red AS (
        |  SELECT l_suppkey, l_partkey, l_quantity
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_name LIKE 'red%'
        |    AND l_shipdate >= TIMESTAMP '1997-01-01'
        |    AND l_shipdate < TIMESTAMP '1998-01-01'),
        |sp AS (SELECT l_suppkey AS sk, l_partkey AS pk,
        |    sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty97
        |  FROM red GROUP BY 1, 2),
        |pt AS (SELECT l_partkey AS pk2,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * 0.3
        |      AS thr
        |  FROM red GROUP BY 1)
        |SELECT s_name, s_acctbal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_2'
        |  AND s_suppkey IN (
        |    SELECT sk FROM sp JOIN pt ON pk = pk2
        |    WHERE CAST(qty97 AS DOUBLE) > thr)
        |ORDER BY s_name""".stripMargin
  )
}
