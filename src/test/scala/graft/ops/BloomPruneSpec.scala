package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins BloomPrune.semiJoin: exactness vs a plain left-semi join, the
  * pre-filter actually pruning rows before the join, and the probe
  * staying inside codegen (plan contains the native predicate, no
  * UDF). */
class BloomPruneSpec extends SparkSpec {

  test("bloom-pruned semi join is exactly the plain semi join") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000)
    val got = BloomPrune.semiJoin(fact, col("l_orderkey"), dim,
      "o_orderkey")
    val want = fact.join(dim, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    assert(got.count() === want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("the bloom filter prunes before the join and stays codegen'd") {
    val fact = Tables.lineitem(spark, sf0001)
    val dim = Tables.orders(spark, sf0001)
      .filter(col("o_totalprice") > 400000)
    // Probe the filter stage alone: with a selective dim, most fact
    // rows must die in the scan-side bloom probe, not in the join.
    val keys = dim.select(col("o_orderkey").cast("long").as("k"))
    val bf = keys.stat.bloomFilter("k", math.max(keys.count(), 1L), 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val pruned = fact.filter(graft.functions.BloomFunctions
      .bloom_might_contain(col("l_orderkey"), bcast))
    val factN = fact.count()
    val exactN = fact.join(dim,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    val prunedN = pruned.count()
    assert(prunedN >= exactN, "bloom must never false-negative")
    assert(prunedN < factN / 2,
      s"selective bloom should prune most of the fact side " +
        s"($prunedN of $factN survived)")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"))
  }

  test("non-BIGINT probe key is rejected at analysis, not at runtime") {
    import spark.implicits._
    val bf = Seq(1L).toDF("k").stat.bloomFilter("k", 1L, 0.01)
    val bcast = spark.sparkContext.broadcast(bf)
    val intKeyed = Seq(1, 2).toDF("ik")
    // an INT key hashes differently than the putLong insert side; the
    // expression must fail analysis instead of diverging between the
    // interpreted (ClassCastException) and codegen (silent widen) paths
    intercept[org.apache.spark.sql.AnalysisException] {
      intKeyed.filter(graft.functions.BloomFunctions
        .bloom_might_contain(col("ik"), bcast)).collect()
    }
    // semiJoin handles the cast itself, so int-keyed facts still work
    val got = BloomPrune.semiJoin(intKeyed, col("ik"),
      Seq(1L).toDF("dk"), "dk").as[Int].collect()
    assert(got.toSeq === Seq(1))
  }

  test("null fact keys are dropped, matching EXISTS semantics") {
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val dim = Seq(1L, 2L).toDF("dk")
    val got = BloomPrune.semiJoin(fact, col("k"), dim, "dk")
      .orderBy("k").as[Option[Long]].collect()
    assert(got.toSeq === Seq(Some(1L), Some(2L)))
  }
}
