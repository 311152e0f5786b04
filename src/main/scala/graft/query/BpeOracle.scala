package graft.query

import graft.ops.Bpe

/** DuckDB replay of the greedy BPE encode — the dynamic half of the
  * oracle surface (round-11 verdict #2: move the BPE queries from
  * rows-only to hash-gated).
  *
  * The merge TABLE is exported from the trained session snapshot
  * ([[Bpe.snapshotFor]]) as an embedded `VALUES` list; the ENCODING is
  * recomputed independently in SQL, never by the production encoder:
  * each distinct corpus word starts as its separator-wrapped character
  * sequence (`|c1||c2||…|`) and a recursive CTE applies the merges in
  * rank order, one non-regex `replace` per rank. For a TRAINED table,
  * rank-order exhaustive application is equivalent to the production
  * encoder's iterative lowest-rank-present loop: training can only
  * emit a pair over symbols that earlier (lower-rank) merges already
  * formed, so when rank r is processed no pair below r can reappear —
  * and a single left-to-right `replace` pass IS the greedy
  * all-occurrences semantics (the doubled separator makes overlapping
  * occurrences like `aaaa` + (a,a) -> [aa][aa] resolve exactly as the
  * encoder does, because each match consumes only its own wrapping).
  * BpeSpec pins the production encoder against an independent Scala
  * reference on the same trap cases; this replay is a THIRD
  * implementation, in a different engine and paradigm.
  *
  * Soundness guard, BOTH sides: the wrapped-string replay is exact
  * only while no SYMBOL and no distinct CORPUS WORD contains the
  * separator `|`, a quote, whitespace/control characters, or a
  * surrogate half (the trainer segments UTF-16 units, DuckDB `(.)`
  * matches codepoints). [[safe]] checks the trained symbols;
  * [[Bpe.replaySnapshotFor]] carries the corpus-side verdict (probed
  * once at training time — the replay wraps EVERY distinct corpus
  * word, so a standalone `'|'` token would break the `||`
  * separator-count arithmetic even with a clean symbol table;
  * round-12 ADVICE). Either failing keeps the affected queries
  * rows-only — never a wrong oracle.
  */
object BpeOracle {

  /** True when every trained symbol keeps the separator-wrapped
    * replay sound (see object doc). */
  private[query] def safe(m: Bpe.Merges): Boolean =
    m.pairs.nonEmpty && m.pairs.forall { case (a, b) =>
      (a + b).forall(c => c > ' ' && c != '|' && c != '\'' &&
        !Character.isSurrogate(c))
    }

  /** The trained table for `sfDir`'s default-parameter corpus, iff a
    * sound replay can be emitted for it: trained symbols clean
    * ([[safe]]) AND every distinct corpus word clean
    * ([[Bpe.replaySnapshotFor]] — the replay wraps ALL corpus words,
    * so the corpus side needs the same guard; round-12 ADVICE). */
  def forKey(sfDir: String): Option[Bpe.Merges] =
    Bpe.replaySnapshotFor(sfDir).filter(safe)

  /** The shared WITH-clause body (callers prepend `WITH RECURSIVE`):
    *  - `merges(r, a, b)`: the exported table, rank-ordered
    *  - `words(doc_id, w)`: per-OCCURRENCE corpus words, the same
    *    lower + `\s+` split as [[Bpe.Merges.countText]]
    *  - `enc(w, s, r)`: each DISTINCT word's wrapped segmentation
    *    after the first r merges (the recursion)
    *  - `wcnt(w, n)`: subword count per distinct word — symbol count
    *    = inner `||` separators + 1
    *  - `bpec(doc_id, n)`: per-doc BPE token count (0 for wordless
    *    docs — none exist in the test corpora, but the LEFT JOIN keeps
    *    the row like the Spark side does)
    */
  def encCtes(m: Bpe.Merges): String = {
    val values = m.pairs.zipWithIndex
      .map { case ((a, b), r) => s"($r, '$a', '$b')" }.mkString(", ")
    val last = m.pairs.length
    s"""merges(r, a, b) AS (VALUES $values),
       |words AS (SELECT doc_id, w FROM (SELECT doc_id,
       |    unnest(string_split_regex(lower(text), '\\s+')) AS w
       |  FROM documents) WHERE w <> ''),
       |enc AS (
       |  SELECT w, regexp_replace(w, '(.)', '|\\1|', 'g') AS s, 0 AS r
       |  FROM (SELECT DISTINCT w FROM words)
       |  UNION ALL
       |  SELECT e.w, replace(e.s, '|' || m.a || '||' || m.b || '|',
       |      '|' || m.a || m.b || '|'), e.r + 1
       |  FROM enc e JOIN merges m ON m.r = e.r
       |  WHERE e.r < $last),
       |wcnt AS (SELECT w,
       |    length(s) - length(replace(s, '||', '|')) + 1 AS n
       |  FROM enc WHERE r = $last),
       |bpec AS (SELECT d.doc_id,
       |    CAST(coalesce(sum(wcnt.n), 0) AS BIGINT) AS n
       |  FROM documents d
       |  LEFT JOIN words ON words.doc_id = d.doc_id
       |  LEFT JOIN wcnt ON wcnt.w = words.w
       |  GROUP BY d.doc_id)""".stripMargin
  }

  /** Ordered subword tokens per distinct word (`tokd(w, tok)`) —
    * appended after [[encCtes]] by the vocabulary oracle. */
  def tokensCte(m: Bpe.Merges): String = {
    val last = m.pairs.length
    s"""tokd AS (SELECT w,
       |    unnest(string_split(trim(s, '|'), '||')) AS tok
       |  FROM enc WHERE r = $last)""".stripMargin
  }
}
