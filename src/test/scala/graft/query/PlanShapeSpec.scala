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
}
