package graft.query

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextAnalysis

/** DuckDB replay of the SimHash near-dup pipeline — the dynamic
  * oracle that moves `dedup_simhash` from rows-only to hash-gated
  * (round-12 verdict's "further shrink the spec-trust surface"
  * direction, the [[BpeOracle]] pattern).
  *
  * The oracle recomputes EVERYTHING independently in SQL: tokenize
  * (`\s+` on lower(trim(text))), 3-gram shingles (distinct per doc,
  * the `shinglesFromTokens` semantics including the <3-token
  * fallback), **xxHash64 of each shingle's UTF-8 bytes with seed 42
  * as pure SQL arithmetic** (UHUGEINT modular multiplies, rotations
  * as disjoint shift-halves, a CTE per round), per-bit majority
  * votes, and the hamming <= 7 pair join over two non-negative
  * 32-bit fingerprint words (the [[graft.ops.Multimodal.dHashWords]]
  * trick — a single 64-bit pack would put bit 63 in the sign
  * position). A hash match therefore proves the native
  * [[graft.functions.SimHash64]] expression, the shingle pipeline,
  * and the banded candidate join end to end against a THIRD
  * implementation of xxHash64 (validated against Spark's own
  * `xxhash64` on every tail-length class).
  *
  * Soundness guard ([[sound]], probed corpus-side like
  * `Bpe.replaySnapshotFor`): the unrolled scalar hash replays inputs
  * of **< 32 bytes** only (no stripe loop — 8/4/1-byte tail rounds
  * are CASE-unrolled), byte extraction assumes **single-byte chars**
  * (`ord` == UTF-8 byte only for ASCII), regex `\s` agrees between
  * Java and RE2 only on `{space, \t, \n, \r, \f}` (Java adds \x0B),
  * and the engine caps votes at 32767 shingles per doc. Any probe
  * failure keeps the query rows-only — never a wrong oracle.
  */
object SimHashOracle {

  import SqlU64._

  /** Little-endian lane of `n` bytes at 0-based offset expression
    * `off` over column `s` — `ord` is the byte value because the
    * guard pins the corpus to ASCII. */
  private def lane(off: String, n: Int): String =
    (0 until n).map { k =>
      s"(ord(substr(s, ($off) + ${k + 1}, 1))::UHUGEINT * " +
        s"${java.math.BigInteger.ONE.shiftLeft(8 * k)}::UHUGEINT)"
    }.mkString("(", " + ", ")")

  /** The xxHash64(seed 42) CTE chain over the distinct shingle
    * strings `u(doc_id, s)` must provide — ends in `xh(s, h)` with
    * `h` the UBIGINT hash. Unrolled for len < 32: up to three 8-byte
    * rounds, one optional 4-byte round, up to three 1-byte rounds,
    * then the avalanche — each round one CTE so the state threads as
    * a column, never a nested megaexpression. */
  private def xxhCtes: String = {
    val h0 = add(s"(42::UHUGEINT + $P5)", "l::UHUGEINT")
    val b = new StringBuilder
    b ++= s"x0 AS (SELECT s, strlen(s) AS l, $h0 AS h\n" +
      "      FROM (SELECT DISTINCT s FROM u)),\n"
    for (c <- 0 until 3)
      b ++= s"x${c + 1} AS (SELECT s, l, CASE WHEN l >= ${8 * (c + 1)}" +
        s" THEN ${round8("h", lane((8 * c).toString, 8))}" +
        s" ELSE h END AS h FROM x$c),\n"
    val off4 = "((l // 8) * 8)"
    b ++= s"x4 AS (SELECT s, l, CASE WHEN l % 8 >= 4" +
      s" THEN ${round4("h", lane(off4, 4))} ELSE h END AS h FROM x3),\n"
    val offb = "((l // 8) * 8 + CASE WHEN l % 8 >= 4 THEN 4 ELSE 0 END)"
    for (k <- 0 until 3)
      b ++= s"x${5 + k} AS (SELECT s, l, CASE WHEN l % 4 >= ${k + 1}" +
        s" THEN ${round1("h", s"ord(substr(s, ($offb) + ${k + 1}, 1))")}" +
        s" ELSE h END AS h FROM x${4 + k}),\n"
    b ++= s"x8 AS (SELECT s, ${mul(xor("h", shr("h", 33)), P2)} AS h" +
      " FROM x7),\n"
    b ++= s"x9 AS (SELECT s, ${mul(xor("h", shr("h", 29)), P3)} AS h" +
      " FROM x8),\n"
    b ++= s"xh AS (SELECT s, (${xor("h", shr("h", 32))})::UBIGINT AS h" +
      " FROM x9)"
    b.toString
  }

  /** The complete oracle statement for `dedup_simhash`. */
  def sql: String =
    s"""WITH
       |toks AS (SELECT doc_id,
       |    regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents),
       |u0 AS (SELECT doc_id,
       |    tk[i.i] || ' ' || tk[i.i+1] || ' ' || tk[i.i+2] AS s
       |  FROM toks, LATERAL (SELECT unnest(range(1, len(tk)-1)) AS i) i
       |  WHERE len(tk) >= 3),
       |u1 AS (SELECT doc_id, array_to_string(tk, ' ') AS s
       |  FROM toks WHERE len(tk) < 3),
       |u AS (SELECT DISTINCT doc_id, s FROM
       |  (SELECT * FROM u0 UNION ALL SELECT * FROM u1)),
       |$xxhCtes,
       |bits AS (SELECT uj.doc_id, b.b,
       |    CASE WHEN ((uj.h::UBIGINT >> b.b) & 1::UBIGINT) = 1
       |      THEN 1 ELSE 0 END AS bit
       |  FROM (SELECT u.doc_id, xh.h FROM u JOIN xh USING (s)) uj,
       |    LATERAL (SELECT unnest(range(64)) AS b) b),
       |votes AS (SELECT doc_id, b, sum(bit) AS v, count(*) AS n
       |  FROM bits GROUP BY 1, 2),
       |simw AS (SELECT doc_id,
       |    sum(CASE WHEN b < 32 AND v*2 > n
       |        THEN (1::BIGINT << b) ELSE 0 END) AS hi,
       |    sum(CASE WHEN b >= 32 AND v*2 > n
       |        THEN (1::BIGINT << (b-32)) ELSE 0 END) AS lo
       |  FROM votes GROUP BY doc_id)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo))
       |    AS INTEGER) AS hamming
       |FROM simw a JOIN simw b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 7
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Corpus-side soundness probe (needs the active session — absent
    * one, stay rows-only). True iff:
    *  - no NULL text and no char outside printable ASCII + the
    *    `{\t, \n, \r, \f}` whitespace subset Java and RE2 agree on;
    *  - every shingle is < 32 bytes (the unrolled hash's domain);
    *  - no doc exceeds the engine's 32767-shingle vote cap.
    */
  private[query] def sound(spark: SparkSession, sfDir: String): Boolean =
    soundDocs(Tables.documents(spark, sfDir))

  private[query] def soundDocs(docs: org.apache.spark.sql.DataFrame)
      : Boolean = {
    val badChars = docs.filter(col("text").isNull ||
        col("text").rlike("[^\\x20-\\x7E\\t\\n\\r\\f]"))
      .limit(1).count()
    if (badChars != 0) return false
    // tokens materialized BEFORE shinglesFromTokens — the inline
    // `shingles(text)` convenience path re-runs the \s+ split once
    // per shingle position inside the transform lambda (the
    // documented 40+ s-at-5000-docs pathology; review-caught here)
    val r = docs
      .select(TextAnalysis.tokens(col("text")).as("toks"))
      .select(TextAnalysis.shinglesFromTokens(col("toks"), 3).as("sh"))
      .select(size(col("sh")).as("n"), explode(col("sh")).as("s"))
      .agg(max(col("n")).as("max_n"),
        max(octet_length(col("s"))).as("max_len"))
      .head()
    !r.isNullAt(0) && r.getInt(0) <= 32767 && r.getInt(1) < 32
  }

  /** The oracle for `sfDir`, iff the probe proves the replay sound. */
  def forCorpus(sfDir: String): Option[String] =
    SparkSession.getActiveSession
      .filter(sound(_, sfDir))
      .map(_ => sql)
}
