package graft.query

import graft.{SparkEntry, SparkSpec}

/** Scale-shape gate over the ENTIRE registered query surface: no
  * registered query may plan a quadratic join (CartesianProduct /
  * BroadcastNestedLoopJoin), because at 100 TB that plan never
  * finishes. Exceptions are explicit and individually justified:
  *
  *  - `*_oracle` queries: deliberately quadratic ground-truth anchors
  *    (exact pair joins kept so the DuckDB oracle and the LSH twins'
  *    recall stay measurable); their scale-safe twins are the
  *    registered production shapes.
  *  - `sim_cosine_topk` (+ its `_int8` quantized twin): exact
  *    brute-force baseline whose DESIGN is a broadcast nested loop —
  *    the query side is small and broadcast, the corpus side streams
  *    once (O(corpus x queries), not O(corpus^2)); the sublinear paths
  *    are sim_cosine_lsh / sim_cosine_ivf / sim_cosine_ivf_indexed.
  *  - `join_cross_dims`: the cross-join operator itself, over two
  *    tiny dimension tables.
  *  - `text_unigram_loglik`: broadcasts a ONE-ROW aggregate (the
  *    corpus word total) onto every row — O(n x 1), the standard
  *    scalar-attach shape, not a pair join.
  *  - `q22_dormant_customers`: same scalar-attach shape — the global
  *    balance threshold is a ONE-ROW broadcast aggregate joined onto
  *    the customer scan (TPC-H q22's scalar subquery, decorrelated).
  *  - `q11_important_parts`: same scalar-attach shape — the global
  *    value total (TPC-H q11's HAVING scalar subquery) is a ONE-ROW
  *    broadcast aggregate joined onto the per-part aggregate.
  */
class PlanShapeSpec extends SparkSpec {

  private val justifiedQuadratic =
    Set("sim_cosine_topk", "sim_cosine_topk_int8", "join_cross_dims",
      "text_unigram_loglik", "q22_dormant_customers",
      "q11_important_parts")

  test("no quadratic join in any registered non-oracle query plan") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        if (name.endsWith("_oracle") || justifiedQuadratic(name)) None
        else {
          val plan = fn(spark, sf0001).queryExecution.executedPlan.toString
          if (plan.contains("CartesianProduct") ||
              plan.contains("BroadcastNestedLoopJoin")) Some(name)
          else None
        }
    }
    assert(offenders.isEmpty,
      s"quadratic join in registered plans: ${offenders.mkString(", ")}")
  }

  // ---- positive pins for the flagship TPC-H plans: the shapes the
  // engine was TUNED to (pushed filters reach the scan, dim stars stay
  // broadcast with no sort-merge shuffle, q21's repeated orders scan is
  // exchange-reused). A Spark upgrade that silently de-optimizes any of
  // these turns a pin red instead of a bench row slow. Counts are
  // asserted as bounds on today's measured plan (PlanAudit values).

  /** AQE-final physical plan text (execute first so AQE finalizes). */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf0001)
    df.collect()
    df.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      .split("== Initial Plan ==").head
  }

  private def count(plan: String, re: String): Int =
    re.r.findAllIn(plan).size

  test("q1: no joins, shipdate pushed to the scan, map-side partials") {
    val plan = finalPlan("q1_pricing_summary")
    assert(count(plan, "Join") == 0, plan)
    assert(plan.contains("LessThanOrEqual(l_shipdate"),
      "shipdate filter must reach PushedFilters")
    assert(plan.contains("partial_"), "aggregation must be two-phase")
    assert(!plan.contains("l_comment"),
      "column pruning must drop unused lineitem columns")
  }

  test("q5: the dim star stays broadcast — no sort-merge shuffle") {
    val plan = finalPlan("q5_regional_revenue")
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "BroadcastHashJoin") >= 4, plan)
    assert(count(plan, "Exchange (hash|range|Single)") <= 2,
      "one partial-agg shuffle (+ result sort) is the budget")
  }

  test("q9: the dim star stays broadcast — no sort-merge shuffle") {
    val plan = finalPlan("q9_product_profit")
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "BroadcastHashJoin") >= 4, plan)
    assert(count(plan, "Exchange (hash|range|Single)") <= 2, plan)
  }

  test("q18: semi-join shape with broadcast sides, single shuffle") {
    val plan = finalPlan("q18_large_orders")
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "BroadcastHashJoin") >= 2, plan)
    assert(plan.contains("partial_"), "aggregation must be two-phase")
    assert(count(plan, "Exchange (hash|range|Single)") <= 2, plan)
  }

  test("q8: seven-table star stays broadcast, date+type filters pushed") {
    val plan = finalPlan("q8_market_share")
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "BroadcastHashJoin") >= 6, plan)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"),
      "orders date range must reach PushedFilters")
    assert(plan.contains("EqualTo(p_type,PROMO"),
      "part type filter must reach PushedFilters")
    assert(count(plan, "BroadcastNestedLoop") == 0, plan)
  }

  test("q10: returnflag pushed, top-20 via TakeOrdered (no global sort)") {
    val plan = finalPlan("q10_returned_items")
    assert(plan.contains("EqualTo(l_returnflag,R)"),
      "returnflag filter must reach PushedFilters")
    assert(plan.contains("TakeOrderedAndProject"),
      "LIMIT over ORDER BY must fuse into a per-partition top-k + " +
        "driver merge, not a global sort")
    assert(plan.contains("partial_"), "aggregation must be two-phase")
    assert(count(plan, "BroadcastNestedLoop") == 0, plan)
  }

  test("q21: the repeated orders broadcast is exchange-reused") {
    val plan = finalPlan("q21_waiting_supplier")
    assert(plan.contains("ReusedExchange"),
      "the orders scan feeding both the semi and anti passes must be " +
        "planned once and reused")
    assert(count(plan, "SortMergeJoin") == 0, plan)
    assert(count(plan, "BroadcastNestedLoop") == 0, plan)
  }
}
