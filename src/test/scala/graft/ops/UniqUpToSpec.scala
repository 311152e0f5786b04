package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins UniqUpTo (bounded-state distinct up to N): exact below the
  * threshold, saturated at N+1 above it, and invariant to
  * partitioning — saturation discards nothing a merge could need.
  */
class UniqUpToSpec extends SparkSpec {
  import spark.implicits._

  test("exact below threshold, N+1 at and beyond it") {
    // per key: 1, 3, 5, and 9 distinct values; threshold 4
    val rows = Seq.tabulate(200)(i => ("k1", 7L)) ++
      Seq.tabulate(90)(i => ("k3", (i % 3).toLong)) ++
      Seq.tabulate(50)(i => ("k5", (i % 5).toLong)) ++
      Seq.tabulate(90)(i => ("k9", (i % 9).toLong))
    val got = rows.toDF("k", "v")
      .groupBy($"k").agg(UniqUpTo.uniqUpTo($"v", 4).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("k1" -> 1L, "k3" -> 3L, "k5" -> 5L, "k9" -> 5L))
  }

  test("partition-invariant: matches least(countDistinct, n+1) on real data") {
    val li = Tables.lineitem(spark, sf0001)
    for (parts <- Seq(1, 7)) {
      val got = li.repartition(parts)
        .groupBy($"l_orderkey")
        .agg(UniqUpTo.uniqUpTo($"l_suppkey", 3).as("u"))
      val want = li.groupBy($"l_orderkey")
        .agg(least(countDistinct($"l_suppkey"), lit(4L)).as("u"))
      assert(got.except(want).isEmpty && want.except(got).isEmpty,
        s"mismatch at $parts partitions")
    }
  }

  test("hashed wrapper counts distinct tuples; nulls ignored by the long path") {
    val df = Seq(("a", Some(1)), ("a", Some(1)), ("a", Some(2)),
      ("b", None), ("b", Some(1))).toDF("g", "x")
    val got = df.groupBy($"g")
      .agg(UniqUpTo.uniqUpToHashed(10, $"x").as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // xxhash64(null) is a defined value in Spark (seed-only hash), so
    // the hashed wrapper COUNTS a null tuple — callers filter nulls
    // when they mean SQL-distinct semantics; the raw long path skips
    // SQL NULL keys (update's null check).
    assert(got("a") == 2L && got("b") == 2L)
  }

  test("analysis-time rejection of non-long keys") {
    val df = Seq(("a", "x")).toDF("g", "s")
    val e = intercept[Exception] {
      df.groupBy($"g").agg(UniqUpTo.uniqUpTo($"s", 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bigint"))
  }
}
