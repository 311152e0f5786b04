package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Reshaping surface: pivot (long->wide), unpivot (wide->long), and
  * corpus vocabulary building (explode + count + top-k) — each
  * oracle-paired.
  */
object ReshapeQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Long->wide: order counts by priority x status. The pivot value
    // list is explicit — deterministic schema and no values-discovery
    // job (which at scale is an extra full scan).
    "pivot_status_counts" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .count()
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
        .orderBy(col("o_orderpriority"))),

    // Wide->long: four lineitem measures melted to (metric, val) rows.
    "unpivot_lineitem_measures" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") <= 100)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "metric", "val")
        // `val` in the ordering: duplicate (l_orderkey, l_linenumber)
        // pairs exist in the synthetic data at every sf, so without it
        // the order of tied rows is engine-dependent
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"),
          col("val"))),

    // Vocabulary top-k over the documents corpus: lowercase, split on
    // non-alphabetic runs, explode, count, top 100 — the vocab-building
    // pass of a tokenizer-training pipeline. Explode + partial count
    // is map-side combined; only (token, partial) pairs shuffle.
    "vocab_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), "[^a-z]+"))
          .as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(100)),

    // Bounded-state heavy hitters (ClickHouse topK analog; see
    // ops/TopK): same answer as vocab_topk but via a SpaceSaving
    // summary aggregate — per-task capacity-bounded state, only
    // summaries shuffle, no distinct-key shuffle at all. Oracle-paired
    // because capacity (4096) exceeds this corpus's vocabulary, which
    // makes the summary provably exact (err_max = 0 on every row);
    // TopKSpec pins the genuinely-approximate small-capacity regime.
    "vocab_topk_approx" -> ((s, d) =>
      graft.ops.TopK.topK(
        Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "[^a-z]+"))
            .as("token"))
          .filter(col("token") =!= ""),
        col("token"), k = 100)),

    // Weighted heavy hitters (ClickHouse topKWeighted analog): top-50
    // parts by revenue via the bounded-state summary, weights in
    // exact integer cents. Oracle-paired because sf0.01 has 2000
    // distinct parts < capacity 4096 => provably exact; at bench sf
    // (20 k parts) the approximation engages, which is the point.
    "topk_weighted_parts" -> ((s, d) =>
      graft.ops.TopK.topKWeighted(Tables.lineitem(s, d),
        col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long"),
        k = 50))
  )

  val oracles: Map[String, String] = Map(
    "pivot_status_counts" ->
      """SELECT o_orderpriority,
        |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "unpivot_lineitem_measures" ->
      """SELECT l_orderkey, l_linenumber, metric, val FROM (
        |  SELECT l_orderkey, l_linenumber,
        |    'l_quantity' AS metric, l_quantity AS val FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber,
        |    'l_extendedprice', l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
        |  FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
        |WHERE l_orderkey <= 100
        |ORDER BY l_orderkey, l_linenumber, metric, val""".stripMargin,
    "vocab_topk" ->
      """SELECT token, count(*) AS n FROM (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
        |    AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY 1 ORDER BY n DESC, token LIMIT 100""".stripMargin,
    "vocab_topk_approx" ->
      """SELECT token AS term, count(*) AS cnt_est,
        |  CAST(0 AS BIGINT) AS err_max FROM (
        |  SELECT unnest(string_split_regex(lower(text), '[^a-z]+'))
        |    AS token FROM documents)
        |WHERE token <> ''
        |GROUP BY 1 ORDER BY cnt_est DESC, term LIMIT 100""".stripMargin,
    "topk_weighted_parts" ->
      """SELECT CAST(l_partkey AS VARCHAR) AS term,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |    AS BIGINT) AS cnt_est,
        |  CAST(0 AS BIGINT) AS err_max
        |FROM lineitem
        |GROUP BY 1 ORDER BY cnt_est DESC, term LIMIT 50""".stripMargin
  )
}
