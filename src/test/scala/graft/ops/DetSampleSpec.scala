package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins DetSample (deterministic bottom-k-by-hash sampling): exact
  * when k covers the group, a driver-recomputable uniform sample when
  * it doesn't, and invariant to partitioning / merge order either way.
  */
class DetSampleSpec extends SparkSpec {
  import spark.implicits._

  test("all-null group: empty sample, null quantiles (no ANSI throw)") {
    val df = Seq(("g1", Some(1.0), 1L), ("g1", Some(3.0), 2L),
      ("g2", None, 3L), ("g2", None, 4L))
      .toDF("g", "v", "id")
    val got = DetSample.approxQuantiles(df, keys = Seq("g"),
        value = col("v"), determinator = Seq(col("id")),
        probs = Seq(0.5), k = 10)
      .orderBy(col("g")).collect()
    // nearest-rank p50 of {1.0, 3.0} is rank ceil(2*0.5)=1 -> 1.0
    assert(got(0).getLong(1) == 2L && got(0).getDouble(2) == 1.0)
    assert(got(1).getLong(1) == 0L && got(1).isNullAt(2))
  }

  test("k >= group: sample is the full multiset, quantiles exact") {
    val orders = Tables.orders(spark, sf0001)
    val got = DetSample.approxQuantiles(orders,
        keys = Seq("o_orderpriority"), value = col("o_totalprice"),
        determinator = Seq(col("o_orderkey")),
        probs = Seq(0.5, 0.9), k = 100000)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    val truth = orders.select(col("o_orderpriority"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k2, vs) =>
        val sorted = vs.map(_._2).sorted
        def q(p: Double) =
          sorted(math.max(1, math.ceil(sorted.length * p).toInt) - 1)
        k2 -> ((sorted.length.toLong, q(0.5), q(0.9)))
      }
    assert(got === truth)
  }

  test("k < group: sample == driver-side bottom-k by (hash, value); " +
      "partitioning-invariant") {
    val df = (1L to 1000L).map(i => (i, (i * 37 % 500).toDouble))
      .toDF("id", "v")
    // ground truth from Spark's own xxhash64 of the determinator
    val hashed = df.select(xxhash64(col("id")).as("h"), col("v"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val expect = hashed.sortBy(identity).take(64).map(_._2).toSeq
    def sampleOf(parts: Int): Seq[Double] =
      df.repartition(parts)
        .agg(DetSample.sampleAgg(col("v"), 64, col("id")).as("s"))
        .collect()(0).getSeq[Double](0)
    val s1 = sampleOf(1)
    val s7 = sampleOf(7)
    assert(s1 === expect,
      "bounded sample must equal the k smallest (hash, value) pairs")
    assert(s7 === expect,
      "sample must be identical under any partitioning / merge order")
    assert(s1.length === 64)
  }

  test("null values and null determinators are skipped, not sampled") {
    val df = Seq((Some(1L), Some(10.0)), (None, Some(20.0)),
      (Some(3L), None), (Some(4L), Some(40.0)))
      .toDF("id", "v")
    val got = df.agg(DetSample.sampleAgg(col("v"), 10, col("id")).as("s"))
      .collect()(0).getSeq[Double](0)
    // xxhash64(null) hashes the seed rather than yielding null, so the
    // null-id row still participates — only the null VALUE row drops
    assert(got.sorted === Seq(10.0, 20.0, 40.0))
  }
}
