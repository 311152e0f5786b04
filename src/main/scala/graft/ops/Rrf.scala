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
}
