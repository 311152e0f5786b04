package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard
  * score-free way to merge ranked lists from incomparable retrievers
  * (BM25 scores and cosine similarities share no scale; their RANKS
  * do): rrf(d) = Σ_lists 1/(c + rank_d), c = 60 per the paper.
  *
  * Deliberately rank-only and engine-portable: ranks are exact
  * integers, each contribution is one IEEE division, and a doc in two
  * lists sums two doubles — bit-identical on any engine, which is what
  * lets the hybrid-retrieval query pair against a SQL oracle. Each
  * input list is top-k-bounded by its retriever, so the fused frame is
  * at most Σ|lists| x k rows — driver-independent, trivially
  * shuffle-bounded.
  */
object Rrf {

  /** Fuse ranked lists (each `(doc_id, rank)`, rank 1-based) into the
    * top `k` by RRF score (rounded to 6; ties to lowest doc_id). */
  def fuse(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf: no lists to fuse")
    val contributions = lists.map(_.select(col("doc_id"),
      (lit(1.0) / (lit(c) + col("rank"))).as("w")))
    val fused = contributions.reduce(_ unionByName _)
      .groupBy(col("doc_id"))
      .agg(round(sum(col("w")), 6).as("rrf"))
    // distributed top-k first, then rank the k survivors (same
    // no-global-window discipline as Bm25.score)
    val top = fused.orderBy(col("rrf").desc, col("doc_id")).limit(k)
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Per-query fusion for BATCHED retrieval (each list
    * `(query_id, doc_id, rank)`): the RRF sum keys on
    * (query_id, doc_id), and ranking is a per-query window — the
    * shuffle key is query_id, so queries parallelize and no global
    * sort exists. Input lists are top-k-bounded per query by their
    * retrievers, so the fused frame is at most
    * |queries| x Σ|lists| x k rows, and the rank ≤ k filter prunes
    * below the shuffle (WindowGroupLimit). Fusing one batch equals
    * running [[fuse]] per query (spec-pinned): same sum, same
    * rounding, same tie order.
    */
  def fuseBatch(lists: Seq[DataFrame], k: Int, c: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrf: no lists to fuse")
    val contributions = lists.map(_.select(col("query_id"), col("doc_id"),
      (lit(1.0) / (lit(c) + col("rank"))).as("w")))
    val unioned = contributions.reduce(_ unionByName _)
    // ONE exchange serves both the sum and the rank window (round-16,
    // guide §2.4 "two operations keyed the same way share one
    // exchange"): hash-partitioning by query_id alone clusters the
    // (query_id, doc_id) groups — the aggregate's ClusteredDistribution
    // is satisfied — AND is exactly the window's required partitioning;
    // the default groupBy(query_id, doc_id) partitioning keyed on BOTH
    // columns forced a second full exchange before the window. The
    // explicit count pins the exchange against AQE coalescing the
    // k-bounded frame below the session's parallelism.
    val parts = unioned.sparkSession.sessionState.conf.numShufflePartitions
    val fused = unioned
      .repartition(parts, col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("w")), 6).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }
}
