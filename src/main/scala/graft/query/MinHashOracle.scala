package graft.query

import org.apache.spark.sql.SparkSession

/** DuckDB replay of the MinHash-LSH incremental-store probe — the
  * dynamic oracle that moves `dedup_incoming_store` from rows-only to
  * hash-gated (round-14 verdict #3; the [[SimHashOracle]] pattern).
  *
  * The registered query probes the PERSISTED [[graft.ops
  * .SignatureStore]] (corpus = non-src0 docs, signature-indexed once)
  * with the arriving src0 batch and exact-Jaccard-verifies band
  * collisions. The oracle recomputes BOTH sides' signatures
  * independently from the `documents` table — deliberately NOT
  * reading the store's parquet, so a stale or corrupted store (a
  * broken `ensure` stamp) would surface as a hash mismatch instead of
  * being replayed as truth. Replayed end to end in SQL:
  *
  *  - the shared shingle pipeline ([[SimHashOracle.shingleCtes]] —
  *    tokenize, distinct 3-gram shingles, the <3-token fallback);
  *  - `MinHashSig`'s two-level permutation hash
  *    (FingerprintExpressions.scala:150-172): per shingle
  *    `base = XXH64.hashLong(xxhash64(s), 42)`, per permutation k
  *    `h_k = XXH64.hashInt(k, base)`, signature = SIGNED min over
  *    shingles per k. The signed min rides unsigned arithmetic via
  *    the order-preserving bias map `x XOR 2^63` (signed order ==
  *    unsigned order of the biased value), so the whole replay stays
  *    in UHUGEINT;
  *  - `Dedup.bandTable`'s band hash (Dedup.scala:144-162): Spark's
  *    multi-column `xxhash64(sig[4b+1..4b+4])` = a seed-chained
  *    hashLong fold from 42 — [[SqlU64.hashLongU]] four times;
  *  - the probe equi-join on (band, sig) between src0 and non-src0
  *    docs, then the exact-Jaccard verify over distinct shingle sets
  *    (|intersect| / (n_a + n_b - |intersect|), round 4, >= t) —
  *    `dedupeIncoming`'s verification arithmetic exactly
  *    (SignatureStore.scala:93-99).
  *
  * Soundness: the same corpus guard as the SimHash replay
  * ([[SimHashOracle.soundDocs]] — ASCII, shingles < 32 bytes); any
  * probe failure keeps the query rows-only, never a wrong oracle.
  */
object MinHashOracle {

  private val NumHashes = 32 // bands 8 x rowsPerBand 4 — ensure() defaults
  private val Bands = 8
  private val RowsPerBand = 4
  private val JaccardT = "0.8"

  /** Bias constant for the signed-order-as-unsigned trick. */
  private val B63 = "9223372036854775808::UHUGEINT"

  /** The complete oracle statement for `dedup_incoming_store`.
    *
    * State threads through CTE COLUMNS, one hash round per CTE — the
    * [[SqlU64.xxhStrCtes]] discipline. A nested composition here is
    * not a style choice: `rotl`/`avalanche` textually duplicate their
    * argument, so chaining four hashLong rounds as one expression
    * grows the SQL ~16x per level (megabytes of expression tree that
    * DuckDB then walks per row — the first cut ran minutes instead of
    * seconds at sf0.01). */
  def sql: String = {
    import SqlU64._
    // per-shingle permutation base: hashLong(xxhash64(s), 42) —
    // round8 with the constant h0, then the avalanche, each over a
    // plain column so no subtree duplicates anything non-trivial
    val h0Long = s"((42::UHUGEINT + $P5 + 8::UHUGEINT) % $M)"
    // per-(shingle, k) permutation hash h0: base + P5 + 4
    val hkH0 = add(add("hb.hb", P5), "4::UHUGEINT")
    val mCols = (0 until RowsPerBand).map(j =>
      s"    max(CASE WHEN k % $RowsPerBand = $j THEN m END) AS m$j")
      .mkString(",\n")
    // the 4-step seed-chained band hash (Spark's multi-column
    // xxhash64 fold) — two CTEs per step (round8, avalanche), the
    // chain value always a plain column named h
    val chainCtes = (0 until RowsPerBand).map { j =>
      val carried = ((j + 1) until RowsPerBand)
        .map(i => s"m$i, ").mkString
      val seed = if (j == 0) "42::UHUGEINT" else "h"
      s"""c${j}r AS (SELECT doc_id, band, $carried
         |    ${round8(add(add(seed, P5), "8::UHUGEINT"), s"m$j")} AS hr
         |  FROM ${if (j == 0) "sg" else s"c${j - 1}a"}),
         |c${j}a AS (SELECT doc_id, band, $carried
         |    ${avalanche("hr")} AS h FROM c${j}r)""".stripMargin
    }.mkString(",\n")
    s"""WITH
       |${SimHashOracle.shingleCtes},
       |${SqlU64.xxhStrCtes("u")},
       |hb1 AS (SELECT s, ${round8(h0Long, "h::UHUGEINT")} AS hr
       |  FROM xh),
       |hb AS (SELECT s, ${avalanche("hr")} AS hb FROM hb1),
       |ks AS (SELECT unnest(range($NumHashes)) AS k),
       |hk1 AS (SELECT hb.s, ks.k,
       |    ${round4(hkH0, "ks.k::UHUGEINT")} AS hr
       |  FROM hb CROSS JOIN ks),
       |hks AS (SELECT s, k, xor(${avalanche("hr")}, $B63) AS hx
       |  FROM hk1),
       |mh AS (SELECT u.doc_id, hks.k, xor(min(hks.hx), $B63) AS m
       |  FROM u JOIN hks USING (s) GROUP BY 1, 2),
       |sg AS (SELECT doc_id, k // $RowsPerBand AS band,
       |$mCols
       |  FROM mh GROUP BY 1, 2),
       |$chainCtes,
       |bnd AS (SELECT doc_id, band, h AS sig
       |  FROM c${RowsPerBand - 1}a),
       |src AS (SELECT doc_id, source FROM documents),
       |inb AS (SELECT b.doc_id, b.band, b.sig FROM bnd b
       |  JOIN src USING (doc_id) WHERE src.source = 'src0'),
       |cb AS (SELECT b.doc_id, b.band, b.sig FROM bnd b
       |  JOIN src USING (doc_id) WHERE src.source <> 'src0'),
       |cand AS (SELECT DISTINCT i.doc_id AS doc_id,
       |    c.doc_id AS dup_of
       |  FROM inb i JOIN cb c ON i.band = c.band AND i.sig = c.sig
       |  WHERE i.doc_id <> c.doc_id),
       |un AS (SELECT doc_id, count(*) AS n FROM u GROUP BY 1),
       |ix AS (SELECT c.doc_id, c.dup_of, count(*) AS inter
       |  FROM cand c
       |  JOIN u a ON a.doc_id = c.doc_id
       |  JOIN u b ON b.doc_id = c.dup_of AND b.s = a.s
       |  GROUP BY 1, 2)
       |SELECT doc_id, dup_of, jaccard FROM (
       |  SELECT c.doc_id, c.dup_of,
       |    round(CAST(COALESCE(i.inter, 0) AS DOUBLE)
       |      / (ua.n + ub.n - COALESCE(i.inter, 0)), 4) AS jaccard
       |  FROM cand c
       |  LEFT JOIN ix i ON i.doc_id = c.doc_id AND i.dup_of = c.dup_of
       |  JOIN un ua ON ua.doc_id = c.doc_id
       |  JOIN un ub ON ub.doc_id = c.dup_of)
       |WHERE jaccard >= $JaccardT
       |ORDER BY doc_id, dup_of""".stripMargin
  }

  /** The oracle for `sfDir`, iff the shared corpus probe proves the
    * string-hash replay sound (same domain as the SimHash replay:
    * the unrolled xxHash64 handles ASCII shingles < 32 bytes). */
  def forCorpus(sfDir: String): Option[String] =
    SparkSession.getActiveSession
      .filter(s => SimHashOracle.sound(s, sfDir))
      .map(_ => sql)
}
