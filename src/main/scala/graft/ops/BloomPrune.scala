package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions

/** Bloom-filter runtime pre-filtering for selective joins — the
  * explicit, pluggable twin of Spark's own AQE runtime filter
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only
  * fires when its creation-side heuristics approve).
  *
  * The 100 TB shape this exists for: a fact table too large to shuffle
  * in full, semi-joined against a dimension subset that is too large
  * to broadcast as a hash relation (100 M+ keys) but whose *bloom
  * filter* is executor-resident cheap (~1.2 bytes/key at 1% fpp). The
  * filter is built distributively (`stat.bloomFilter` tree-aggregates;
  * the driver only ever holds the final bitset), broadcast once per
  * executor, and probed inside the fact scan's codegen span — so the
  * shuffle that feeds the exact join sees only rows that *might*
  * match. False positives (~fpp of non-matching rows) are removed by
  * the exact semi join that follows; false negatives cannot occur, so
  * the composed operator is exact and oracle-paired
  * (`join_bloom_prune`).
  */
object BloomPrune {

  private val KeyCol = "__bloom_key"

  /** Exact left-semi join of `fact` against `dim`'s `dimKey`, with a
    * bloom pre-filter on `factKey` applied before any shuffle of the
    * fact side. Long (integral) keys only — see
    * [[graft.functions.BloomMightContainLong]].
    *
    * The extra `count()` job sizes the filter's bit array; it runs on
    * the dimension side only (the already-filtered small side — never
    * the fact table), which is the same side `stat.bloomFilter` scans
    * anyway.
    */
  def semiJoin(fact: DataFrame, factKey: Column, dim: DataFrame,
      dimKey: String, fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey).cast("long").as(KeyCol))
      .filter(col(KeyCol).isNotNull)
    val n = math.max(keys.count(), 1L)
    val bf = keys.stat.bloomFilter(KeyCol, n, fpp)
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    // explicit cast: the probe expression requires BIGINT (narrower
    // integrals would hash differently than the putLong insert side)
    fact.filter(BloomFunctions.bloom_might_contain(factKey.cast("long"),
        bcast))
      .join(keys, factKey === col(KeyCol), "left_semi")
  }
}
