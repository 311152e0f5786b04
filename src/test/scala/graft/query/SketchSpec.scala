package graft.query

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Accuracy bounds for the approximate sketches (no DuckDB oracle —
  * sketch internals differ across engines, so the contract is
  * closeness to the exact answer, not bit equality).
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val li = Tables.lineitem(spark, sf0001)
    val approx = SqlSurfaceQueries.queries("agg_approx_sketches")(
      spark, sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("o"),
        countDistinct(col("l_partkey")).as("p"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    exact.foreach { case (k, (o, p)) =>
      val (ao, ap) = approx(k)
      assert(math.abs(ao - o).toDouble / o < 0.05, s"$k orders $ao vs $o")
      assert(math.abs(ap - p).toDouble / p < 0.05, s"$k parts $ap vs $p")
    }
  }

  test("approx percentiles are ordered and within the value range") {
    val rows = SqlSurfaceQueries.queries("agg_approx_sketches")(
      spark, sf0001).collect()
    val (lo, hi) = {
      val r = Tables.lineitem(spark, sf0001)
        .agg(min("l_extendedprice"), max("l_extendedprice")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      val p50 = r.getDouble(3)
      val p95 = r.getDouble(4)
      assert(p50 <= p95 && p50 >= lo && p95 <= hi)
    }
  }
}
