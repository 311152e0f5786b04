package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the step that
  * turns pairwise near-duplicate hits into duplicate *clusters* (keep
  * one representative per component, drop the rest). Greedy pair-wise
  * dropping ([[Dedup.dropNearDuplicates]]) under-merges transitive
  * chains; components are the exact closure.
  *
  * Algorithm: iterative min-label propagation. Every node starts
  * labeled with its own id; each round every node takes the min of its
  * own and its neighbors' labels; fixpoint = every node carries its
  * component's global min id (equal to the recursive-CTE "min reachable
  * id" formulation an SQL engine runs). Rounds needed = graph diameter
  * — near-dup graphs are unions of small cliques, so a handful. Each
  * round is one join + one groupBy on the edge list (shuffle-bounded,
  * no driver-side graph), with `localCheckpoint` cutting the lineage so
  * plans don't grow with iterations.
  */
object Components {

  /** Rounds a `pointerDoubling = false` run propagates linearly before
    * switching the jump join ON anyway (round-16, round-15 ADVICE):
    * near-dup similarity is not transitive, so a caller's "the graph
    * is clique-shaped" is a measurement, not an invariant — a
    * chain-like component of diameter > maxIter would otherwise turn
    * the disabled optimization into a hard `require(converged)`
    * failure at scale. Clique unions converge in ~2-5 rounds and
    * never reach the switch (keeping the measured ~25%/round saving);
    * anything still moving after this many rounds gets logarithmic
    * convergence, so total rounds are bounded by
    * AdaptiveDoublingAfter + O(log2 diameter) — far inside the
    * default maxIter for any physical graph. */
  val AdaptiveDoublingAfter = 6

  /** @param edges two-column DataFrame (`src`, `dst`), undirected.
    * @param pointerDoubling add the comp -> label(comp) jump join each
    *   round. Keeps round count logarithmic in component diameter — the
    *   safe default for arbitrary graphs at scale. For clique-union
    *   graphs (near-dup clusters) it saves no rounds and costs one join
    *   per round (measured: 5 rounds either way on the sf0.1 near-dup
    *   graph, ~25% cheaper per round without it — graft.CompExp), so
    *   callers that KNOW the graph is clique-shaped may disable it —
    *   `false` means "start without the jump join", and the run
    *   switches it on adaptively after [[AdaptiveDoublingAfter]]
    *   non-converged rounds (the clique assumption is then observably
    *   wrong for this input, and linear propagation on a deep
    *   component must not run into the maxIter failure).
    * @param verbose print per-round changed counts (diagnostics).
    * @return (`id`, `comp`) for every node incident to an edge, where
    *   `comp` is the smallest node id in the component.
    */
  def connectedComponents(edges: DataFrame,
      maxIter: Int = 25, pointerDoubling: Boolean = true,
      verbose: Boolean = false): DataFrame = {
    // materialize the edge list ONCE before mirroring: `edges` is often
    // an expensive upstream plan (e.g. the near-dup pair join), and the
    // union would otherwise execute it twice
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("comp")).as("ncomp"))
      val m1 = labels
        .join(neighborMin, Seq("id"), "left_outer")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp")))
            .as("comp"), col("comp").as("old"))
      // pointer doubling: additionally jump comp -> label(comp). Labels
      // only ever hold ids inside the same component and only decrease,
      // so the jump preserves correctness while making convergence
      // logarithmic in component diameter instead of linear (a 75-node
      // chain-ish component converges in ~4 rounds, not ~11).
      val doubleNow = pointerDoubling || i >= AdaptiveDoublingAfter
      val updated = (if (!doubleNow) m1
        else m1
          .join(labels.select(col("id").as("comp"),
            col("comp").as("jump")), Seq("comp"), "left_outer")
          .select(col("id"),
            least(col("comp"), coalesce(col("jump"), col("comp")))
              .as("comp"), col("old")))
        .localCheckpoint(true)
      // convergence check scans the just-materialized frame — no
      // second shuffle join per iteration
      val changed = updated.filter(col("comp") =!= col("old")).count()
      if (verbose) println(s"[components] round $i changed=$changed")
      labels = updated.select(col("id"), col("comp"))
      converged = changed == 0
      i += 1
    }
    require(converged, s"label propagation did not converge in $maxIter")
    labels
  }

  /** Representative-per-cluster dedup: every node that is NOT its
    * component's min id, as (id, kept) pairs — the drop list with the
    * survivor it duplicates.
    */
  def dropList(edges: DataFrame, maxIter: Int = 25): DataFrame =
    connectedComponents(edges, maxIter)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as("dropped"), col("comp").as("kept"))
}
