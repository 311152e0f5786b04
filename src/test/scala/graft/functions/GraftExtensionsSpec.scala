package graft.functions

import graft.SparkSpec

/** Pins the SQL surface of the bounded-state aggregates: after
  * GraftExtensions.register, uniq_up_to / deterministic_sample /
  * space_saving_topk run from spark.sql like built-ins, with the
  * same results as their Column-API forms.
  */
class GraftExtensionsSpec extends SparkSpec {
  import spark.implicits._

  GraftExtensions.register(spark)

  test("uniq_up_to from SQL == least(countDistinct, n+1)") {
    Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L),
      ("b", 3L), ("b", 4L)).toDF("g", "v").createOrReplaceTempView("uut")
    val got = spark.sql(
      "SELECT g, uniq_up_to(v, 2) AS u FROM uut GROUP BY g ORDER BY g")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("a", 2L), ("b", 3L)))
  }

  test("deterministic_sample from SQL matches the Column API") {
    val df = Seq.tabulate(50)(i => (i % 3, i.toDouble, i.toLong))
      .toDF("g", "v", "id")
    df.createOrReplaceTempView("ds")
    val sql = spark.sql(
      """SELECT g, deterministic_sample(v, xxhash64(id), 5) AS s
        |FROM ds GROUP BY g ORDER BY g""".stripMargin)
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    val api = df.groupBy($"g")
      .agg(graft.ops.DetSample.sampleAgg($"v", 5, $"id").as("s"))
      .orderBy($"g")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    assert(sql.toSeq == api.toSeq)
  }

  test("space_saving_topk from SQL is exact below capacity") {
    Seq.fill(7)("x").zipWithIndex.map { case (s, i) =>
      (s + (i % 3), 2L)
    }.toDF("term", "w").createOrReplaceTempView("sst")
    val got = spark.sql(
      """SELECT inline(space_saving_topk(term, w, 16))
        |FROM sst ORDER BY cnt_est DESC, term""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // 7 rows over terms x0,x1,x2 with weight 2: counts 6,4,4; no
    // eviction at capacity 16 so err_max is 0 everywhere
    assert(got.toSeq == Seq(("x0", 6L, 0L), ("x1", 4L, 0L),
      ("x2", 4L, 0L)))
  }

  test("size arguments must be literals") {
    Seq((1L, 2L)).toDF("v", "n").createOrReplaceTempView("lits")
    val e = intercept[Exception] {
      spark.sql("SELECT uniq_up_to(v, n) FROM lits").collect()
    }
    assert(e.getMessage.contains("literal"))
  }
}
