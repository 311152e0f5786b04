package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.CentroidFunctions.{centroid_cell, centroid_top_cells}
import graft.functions.LshFunctions.lsh_signatures
import graft.functions.VectorFunctions.{vec_dot, vec_norm}

/** Similarity search over an embedding column (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — exact, and with a broadcast
  * query side it is a single narrow pass over the corpus (no shuffle
  * except the final per-query top-k), so it scales to any corpus size
  * at O(|corpus| x |queries| x dim).
  *
  * Scale path: random-hyperplane LSH bucketing — signatures are a narrow
  * map; candidate generation is a bucket-equality join, so the pair
  * space shrinks from |corpus|^2 to the bucket collision set. Exact
  * re-ranking runs only on candidates.
  *
  * All vector arithmetic goes through the native codegen
  * [[graft.functions.VectorDot]] expression (primitive loop inside
  * whole-stage codegen); no UDFs, no per-element lambda frames.
  */
object Similarity {

  /** Embedding dimensionality, read from the data (array schemas don't
    * carry length): one LIMIT-1 scan, a driver-side scalar, MEMOIZED per
    * file source — five registered queries route through this, and
    * without the cache each invocation re-fired the probe job. The key
    * is the scan's root paths + the canonicalized plan (paths alone
    * would merge differently-filtered frames of one table — harmless
    * for dim, but cheap to keep exact). Frames whose leaves are NOT
    * file scans (in-memory test corpora) are never cached: a
    * LocalRelation's canonicalized form omits its data, so two local
    * frames with equal schemas but different dims would collide — and
    * probing local data costs no Spark job worth saving. File inputs
    * are immutable within a session, so entries never go stale. */
  private val dimCache =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()

  private[ops] def dimCacheKey(df: DataFrame): Option[String] = {
    val plan = df.queryExecution.analyzed
    val leaves = plan.collectLeaves()
    val paths = leaves.flatMap {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            Some(fs.location.rootPaths.mkString(","))
          case _ => None
        }
      case _ => None
    }
    if (paths.nonEmpty && paths.length == leaves.length)
      Some(paths.mkString(";") + "|" + plan.canonicalized.toString)
    else None
  }

  private[ops] def embDim(df: DataFrame): Int = {
    def probe: Int =
      df.select(size(col("embedding")).as("d")).limit(1).collect()
        .headOption.map(_.getInt(0))
        .getOrElse(throw new IllegalArgumentException(
          "cannot infer embedding dim from an empty corpus — pass dim explicitly"))
    dimCacheKey(df) match {
      case None => probe
      case Some(key) =>
        val cached = dimCache.get(key)
        if (cached != null) cached.intValue()
        else { val d = probe; dimCache.put(key, d); d }
    }
  }

  /** Dot product — native codegen expression (see
    * [[graft.functions.VectorDot]]); double accumulation over
    * float/double arrays. */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  /** Cosine similarity between two float-array columns (double math,
    * dot/(|a|*|b|) association — matches the oracle's formula). */
  def cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))

  /** Exact top-k neighbors for each query vector (excluding self).
    * queries is expected to be small -> broadcast; ranking is on the
    * 4-decimal-rounded similarity with id tie-break so results are
    * deterministic and engine-portable.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      vec_norm(col("embedding")).as("q_norm"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_emb"),
      vec_norm(col("embedding")).as("c_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("q_emb"), col("c_emb"))
          / (col("q_norm") * col("c_norm")), 4).as("sim"))
    // per-query heap top-k (round 14): brute force scores |corpus|
    // candidates PER QUERY — a query_id-partitioned rank window is
    // the hot-partition shape at scale (GroupTopN.rankByScore)
    rankSim(scored, k)
  }

  /** Shared per-query exact top-k: (sim DESC, neighbor_id ASC) with a
    * dense rank, heap-selected — see [[GroupTopN.rankByScore]] for
    * the fixed-point equivalence to the old rank-window formulation
    * (every `sim` here is `round(..., 4)`). */
  private def rankSim(scored: DataFrame, k: Int): DataFrame =
    GroupTopN.rankByScore(scored, Seq(col("query_id")), col("sim"),
        col("neighbor_id"), k, decimals = 4,
        scoreName = "sim", idName = "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank"))

  /** Mean-pooled class centroids: one row per (label, dim) with the
    * average component value, double math. One posexplode map stage +
    * one groupBy whose shuffle carries only (sum, count) partials per
    * (label, dim) group — map-side combine bounds the exchange at
    * |labels| x dim rows per task regardless of corpus size, so the
    * pass scales to 100 TB as a single narrow aggregation. Output is
    * the class-prototype table used for nearest-class-mean
    * classification or supervised IVF seeding.
    */
  def labelCentroids(vectors: DataFrame,
      labelCol: String = "label"): DataFrame =
    vectors
      .select(col(labelCol),
        posexplode(col("embedding")).as(Seq("dim", "component")))
      .groupBy(col(labelCol), col("dim").cast("long").as("dim"))
      .agg(round(avg(col("component").cast("double")), 4).as("centroid"))

  /** All pairs (a < b) with cosine >= t — embedding-space near-dup
    * detection. Exact (quadratic); the LSH variant below is the scale
    * path.
    */
  def nearDupPairs(vectors: DataFrame, t: Double): DataFrame = {
    val a = vectors.select(col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"),
      vec_norm(col("embedding")).as("norm_a"))
    val b = vectors.select(col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"),
      vec_norm(col("embedding")).as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(vec_dot(col("emb_a"), col("emb_b"))
          / (col("norm_a") * col("norm_b")), 4).as("sim"))
      .filter(col("sim") >= t)
  }

  /** LSH-bucketed near-dup pairs: multi-table hyperplane signatures,
    * bucket-collision candidates (equality join on (table, sig) — no
    * cross join), exact cosine verification of candidates. The scale
    * path for [[nearDupPairs]]; recall < 1 by the banding curve (rises
    * with `tables`, and with true-pair similarity).
    */
  def nearDupPairsLsh(vectors: DataFrame, t: Double, tables: Int = 8,
      planesPerTable: Int = 8): DataFrame =
    verifyCandidates(
      lshCandidates(vectors, tables, planesPerTable).localCheckpoint(true),
      vectors, t)

  /** The signature + bucket-collision stage of [[nearDupPairsLsh]]:
    * candidate id pairs (vec_a < vec_b), deduplicated across tables.
    * Split out so the stage can be persisted once and shared by every
    * consumer of the same corpus (pair listing, components, cleaning). */
  def lshCandidates(vectors: DataFrame, tables: Int = 8,
      planesPerTable: Int = 8): DataFrame = {
    val bc = broadcastPlanes(vectors, tables, planesPerTable)
    // NULL embeddings are excluded from candidate generation BY
    // CONTRACT (made explicit here; lsh_signatures null-propagates and
    // posexplode(null) emits nothing, so the filter documents rather
    // than changes the plan's behavior). NOTE: the round-7 literal
    // formulation bucketed null rows at sig=0 — an artifact, not a
    // feature; the bit-parity pin on the rewrite holds for every
    // non-null row.
    val ex = vectors
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        posexplode(lsh_signatures(col("embedding"), bc))
          .as(Seq("table", "sig")))
    ex.as("a").join(ex.as("b"),
        col("a.table") === col("b.table") &&
          col("a.sig") === col("b.sig") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** Exact-cosine verification of candidate id pairs against the corpus
    * (the cheap, narrow half of the LSH path: two equi-joins to fetch
    * embeddings + a codegen'd dot product per candidate). */
  def verifyCandidates(cand: DataFrame, vectors: DataFrame,
      t: Double): DataFrame = {
    val withNorm = vectors.select(col("vec_id"),
      col("embedding").as("emb"), vec_norm(col("embedding")).as("norm"))
    // no broadcast hints: at test scale both sides are tiny; at real
    // scale AQE broadcasts the (small) candidate side into the corpus
    cand
      .join(withNorm.select(col("vec_id").as("vec_a"),
        col("emb").as("emb_a"), col("norm").as("norm_a")), "vec_a")
      .join(withNorm.select(col("vec_id").as("vec_b"),
        col("emb").as("emb_b"), col("norm").as("norm_b")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(vec_dot(col("emb_a"), col("emb_b"))
          / (col("norm_a") * col("norm_b")), 4).as("sim"))
      .filter(col("sim") >= t)
  }

  /** Materialize [[lshCandidates]] iff not already on disk (the same
    * fingerprint-guarded ensure contract as [[ensureQuantized]] /
    * VectorIndex.ensureIvf / SignatureStore.ensure) and return a reader
    * over the persisted pair table. The signature computation + 8-table
    * self-join is the expensive stage of every LSH consumer —
    * `embedding_neardup_lsh` and `dedup_components_lsh` previously
    * recomputed it back-to-back; sharing it here means each query is a
    * candidate scan + exact verify. At 100 TB this IS the production
    * layout: signatures/candidates are built once per corpus snapshot
    * and every downstream dedup pass reads them. */
  def ensureLshCandidates(vectors: DataFrame, path: String,
      tables: Int = 8, planesPerTable: Int = 8): DataFrame = {
    val spark = vectors.sparkSession
    val fs = graft.scale.Hdfs.of(spark, path)
    graft.scale.Hdfs.ensureStamped(fs,
      new org.apache.hadoop.fs.Path(s"$path/_graft_meta"),
      Seq(new org.apache.hadoop.fs.Path(s"$path/cand/_SUCCESS")),
      s"rows=${vectors.count()};tables=$tables;planes=$planesPerTable") {
      lshCandidates(vectors, tables, planesPerTable).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/cand")
    }
    spark.read.parquet(s"$path/cand")
  }

  /** Symmetric per-vector int8 quantization: scale = max|x|/127, each
    * component rounds to [-127, 127]. Cuts the corpus' scan bytes 4×
    * (the lever that matters at 100 TB, where ANN cost is dominated by
    * reading embeddings), at ≤ scale/2 per-component error. Pure
    * array-HOF projection — codegen'd, no UDF.
    * @return (vec_id, q_scale double, q_emb array<tinyint>) plus any
    *   other input columns.
    */
  def quantize(corpus: DataFrame): DataFrame =
    corpus
      .withColumn("q_scale",
        aggregate(col("embedding"), lit(0.0d),
          (acc, x) => greatest(acc, abs(x.cast("double")))) / lit(127.0))
      .withColumn("q_emb",
        transform(col("embedding"), x =>
          when(col("q_scale") === 0.0, lit(0))
            .otherwise(round(x.cast("double") / col("q_scale")))
            .cast("byte")))
      .drop("embedding")

  /** Materialize the quantized corpus iff not already on disk (same
    * fingerprint-guarded contract as [[VectorIndex.ensureIvf]] /
    * SignatureStore.ensure) and return a reader over it — the scan
    * that actually realizes the 4× byte saving. Returns the persisted
    * (vec_id, q_scale, q_emb) frame.
    */
  def ensureQuantized(corpus: DataFrame, path: String): DataFrame = {
    val spark = corpus.sparkSession
    val fs = graft.scale.Hdfs.of(spark, path)
    graft.scale.Hdfs.ensureStamped(fs,
      new org.apache.hadoop.fs.Path(s"$path/_graft_meta"),
      Seq(new org.apache.hadoop.fs.Path(s"$path/codes/_SUCCESS")),
      s"rows=${corpus.count()}") {
      quantize(corpus).write
        .mode(org.apache.spark.sql.SaveMode.Overwrite)
        .parquet(s"$path/codes")
    }
    spark.read.parquet(s"$path/codes")
  }

  /** Inverse of [[quantize]]: float embeddings reconstructed from the
    * int8 codes (within scale/2 per component). */
  def dequantize(quantized: DataFrame): DataFrame =
    quantized
      .withColumn("embedding",
        transform(col("q_emb"),
          b => (b.cast("double") * col("q_scale")).cast("float")))
      .drop("q_emb", "q_scale")

  /** Deterministic random hyperplanes (seeded): table t draws
    * `planesPerTable` x `dim` gaussians from Random(42 + t) — the
    * identical stream the round-7 plan-literal formulation used, so
    * signatures are bit-for-bit unchanged. Shipped to executors as ONE
    * broadcast probed by the native [[graft.functions.LshSignatures]]
    * expression: the literal form embedded tables x planes x dim
    * doubles in the plan on BOTH join sides — the same plan-bloat
    * disease the IVF centroids had before [[graft.functions.CentroidTopCells]],
    * and the prime suspect in round 7's codegen-cache-sensitive 4-5x
    * bench swings on the LSH queries. */
  private def broadcastPlanes(df: DataFrame, tables: Int,
      planesPerTable: Int): org.apache.spark.broadcast.Broadcast[
      Array[Array[Array[Double]]]] = {
    val dim = embDim(df)
    val planes: Array[Array[Array[Double]]] =
      Array.tabulate(tables) { t =>
        val rnd = new scala.util.Random(42L + t)
        Array.fill(planesPerTable)(Array.fill(dim)(rnd.nextGaussian()))
      }
    df.sparkSession.sparkContext.broadcast(planes)
  }

  /** IVF (inverted-file) approximate top-k: the corpus is partitioned
    * into `numCells` cells by nearest centroid (one narrow assignment
    * pass); each query probes only its `nProbe` nearest cells, so the
    * scored pair space is ~|corpus| x nProbe/numCells per query.
    * Centroids are a deterministic strided sample of the corpus
    * (k-means refinement would drop in without changing the dataflow);
    * they ship to executors as a BROADCAST value probed by the native
    * [[graft.functions.CentroidTopCells]] expression — the plan stays
    * one node regardless of numCells (50 k production cells would be
    * tens of millions of literals if embedded in the plan).
    */
  /** One Lloyd (k-means) sweep: assign every vector to its best cell,
    * recompute each cell's mean vector distributedly (64 avg-aggs over
    * the assignment — map-side combined, one small shuffle), keep the
    * old centroid for any emptied cell. */
  private def lloydStep(corpus: DataFrame,
      cents: Array[Array[Double]], dim: Int): Array[Array[Double]] = {
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val dimAggs = (0 until dim).map(j =>
      avg(element_at(col("embedding"), j + 1)).as(s"d$j"))
    val means = corpus
      .withColumn("cell", centroid_cell(col("embedding"), bc))
      .groupBy(col("cell")).agg(dimAggs.head, dimAggs.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        (0 until dim).map(j => r.getDouble(j + 1)).toArray).toMap
    cents.indices.map(i => means.getOrElse(i, cents(i))).toArray
  }

  /** Strided-seed centroids, optionally Lloyd-refined — the shared
    * clustering front-end of [[ivfTopK]] and [[semanticDedup]]. Tiny
    * driver-side collects only (numCells rows + per-iter cell means),
    * but still `1 + refineIters` Spark jobs — so MEMOIZED per file
    * source like [[embDim]] (same key discipline: file scans only;
    * in-memory frames are never cached because LocalRelation
    * canonicalizes without its data). Repeated IVF / semantic-dedup
    * calls over one corpus snapshot then pay the clustering once. */
  private val centCache = new java.util.concurrent.ConcurrentHashMap[
    String, Array[Array[Double]]]()

  private[ops] def centroids(corpus: DataFrame, numCells: Int,
      refineIters: Int): Array[Array[Double]] = {
    dimCacheKey(corpus) match {
      case Some(k) =>
        centCache.computeIfAbsent(
          s"$k|cells=$numCells|iters=$refineIters",
          _ => computeCentroids(corpus, numCells, refineIters))
      case None => computeCentroids(corpus, numCells, refineIters)
    }
  }

  private def computeCentroids(corpus: DataFrame, numCells: Int,
      refineIters: Int): Array[Array[Double]] = {
    val dim = embDim(corpus)
    val seeds: Array[Array[Double]] = {
      val n = corpus.count()
      val stride = math.max(1L, n / numCells)
      corpus.select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % stride === 0)
        .orderBy(col("vec_id")).limit(numCells)
        .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    }
    (0 until refineIters).foldLeft(seeds)((c, _) =>
      lloydStep(corpus, c, dim))
  }

  /** @param refineIters Lloyd iterations applied to the strided seed
    *   centroids (0 = seeds as-is). Each iteration is one narrow
    *   assignment pass + one tiny shuffle. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      numCells: Int = 16, nProbe: Int = 4,
      refineIters: Int = 0): DataFrame = {
    val cents = centroids(corpus, numCells, refineIters)
    val bc = corpus.sparkSession.sparkContext.broadcast(cents)
    val c = corpus
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"),
        vec_norm(col("embedding")).as("c_norm"),
        centroid_cell(col("embedding"), bc).as("cell"))
    // query side: rank all cells, probe the top nProbe
    val q = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"),
        explode(centroid_top_cells(col("embedding"), bc, nProbe))
          .as("cell"))
    val ranked = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(vec_dot(col("q_emb"), col("c_emb"))
          / (col("q_norm") * col("c_norm")), 4).as("sim"))
    rankSim(ranked, k)
  }

  /** LSH-bucketed near-neighbor candidates re-ranked exactly: same
    * output shape as [[bruteForceTopK]] but the cross join is replaced
    * by a bucket-equality join. Standard multi-table hyperplane LSH:
    * `tables` independent signatures of `planesPerTable` bits each
    * (distinct seeds), plus hamming-1 multiprobe on the query side —
    * recall rises with tables, candidate count stays ~|corpus| x
    * tables x probes / 2^bits instead of |corpus| x |queries|.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
      tables: Int = 4, planesPerTable: Int = 8): DataFrame = {
    val bc = broadcastPlanes(corpus, tables, planesPerTable)
    val c = corpus
      .select(col("vec_id").as("neighbor_id"),
        col("embedding").as("c_emb"),
        posexplode(lsh_signatures(col("embedding"), bc))
          .as(Seq("table", "sig")))
    // query side: own bucket + each hamming-1 neighbor, per table
    val q = queries
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        posexplode(lsh_signatures(col("embedding"), bc))
          .as(Seq("table", "sig0")))
      .select(col("query_id"), col("q_emb"), col("table"),
        explode(array((col("sig0") +: (0 until planesPerTable).map(i =>
          col("sig0").bitwiseXOR(lit(1L << i)))): _*)).as("sig"))
      .distinct()
    val scored = c.join(broadcast(q), Seq("table", "sig"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("q_emb"), col("c_emb")), 4).as("sim"))
      .distinct()
    rankSim(scored, k)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * "SemDeDup: Data-efficient learning at web-scale through semantic
    * deduplication", arXiv:2303.09540): cluster the corpus by nearest
    * centroid, run exact pairwise cosine WITHIN each cell only, and
    * drop the higher-id member of every pair with sim >= `t`.
    *
    * The scale contract: the pair space is Σ|cell|² instead of
    * |corpus|² — with balanced cells that is |corpus|²/numCells, and
    * numCells grows with the corpus (the paper used 50 k cells for
    * LAION). The within-cell join is an equi-join on `cell`, so each
    * cell's quadratic work is shuffle-local to one partition group; no
    * all-pairs plan exists at any size.
    *
    * Cell-BOUNDARY recall: pairing runs over each vector's top-2
    * nearest cells (SemDeDup's own second-nearest-cell mitigation), so
    * a near-identical pair split across a cell boundary is still
    * compared whenever either member's second cell is the other's
    * first — at ~4x the within-cell pair work (each cell's member list
    * roughly doubles). Pairs whose cells are disjoint even at depth 2
    * remain missed, the residual trade the paper accepts.
    *
    * Returns the KEPT rows as (vec_id, cell) with `cell` the PRIMARY
    * (nearest) cell, lowest id per duplicate pair surviving —
    * deterministic for a fixed centroid set (refineIters = 0 makes it
    * fully so: strided seeds are literals).
    */
  def semanticDedup(vectors: DataFrame, t: Double, numCells: Int = 16,
      refineIters: Int = 0): DataFrame =
    semanticDedup(vectors, t, centroids(vectors, numCells, refineIters))

  /** [[semanticDedup]] against a caller-supplied centroid set — the
    * production entry point: at scale the centroids come from a
    * trained/persisted clustering (e.g. the IVF index build), not an
    * ad-hoc strided sample. */
  def semanticDedup(vectors: DataFrame, t: Double,
      cents: Array[Array[Double]]): DataFrame = {
    val bc = vectors.sparkSession.sparkContext.broadcast(cents)
    // Staged (round-15 optimization, guide §1.3): the assigned frame
    // feeds THREE consumers (both sides of the cell self-join and the
    // final keeper projection) — unstaged, each consumer re-scans the
    // embeddings and re-computes vec_norm + centroid_top_cells
    // (ScanAudit: 3 embeddings scans; 1 after).
    // DOCUMENTED EXCEPTION to the stage-only-narrower-frames rule
    // (round-15 ADVICE, measured round-16): this stage carries the
    // full embedding column beside (vec_id, norm, cells) — wider than
    // its source — so in parquet stage mode (real clusters) every run
    // rewrites the embedding corpus to scratch once. The rule-abiding
    // alternative (stage only (vec_id, norm, cells), join embeddings
    // back onto the candidate pairs for the dot check) measured 1.02 s
    // vs 0.69 s at sf0.1: the two join-backs shuffle the PAIR set by
    // vec_a then vec_b — pair cardinality is cell-quadratic, i.e.
    // larger than the corpus — while the wide stage moves each
    // embedding exactly once into the cell join. The wide stage is
    // the §8 "move the heavy bytes once" shape here; the scratch
    // write is the documented cluster-mode price.
    val assigned = graft.scale.Staging.materialize(
      vectors.select(col("vec_id"), col("embedding"),
        vec_norm(col("embedding")).as("norm"),
        centroid_top_cells(col("embedding"), bc, 2).as("cells")),
      "semantic-assigned")
    // pairing frame: one row per (vector, cell) for its top-2 cells;
    // a pair meeting in BOTH cells is collapsed by the drops distinct
    def side(s: String) = assigned.select(
      explode(col("cells")).as("cell"),
      col("vec_id").as(s"vec_$s"), col("embedding").as(s"emb_$s"),
      col("norm").as(s"norm_$s"))
    val drops = side("a").join(side("b"), "cell")
      .filter(col("vec_a") < col("vec_b"))
      .filter(round(vec_dot(col("emb_a"), col("emb_b"))
        / (col("norm_a") * col("norm_b")), 4) >= t)
      .select(col("vec_b").as("vec_id")).distinct()
    assigned
      .select(col("vec_id"), element_at(col("cells"), 1).as("cell"))
      .join(drops, Seq("vec_id"), "left_anti")
  }
}
