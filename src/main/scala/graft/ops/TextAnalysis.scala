package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline, over the
  * `documents` table. All pure column expressions (codegen'd, no UDFs):
  * at 100 TB these run as narrow map stages inside whole-stage codegen,
  * no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokenization — the shared primitive. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Word n-gram shingles (distinct) over an ALREADY-MATERIALIZED token
    * array column. The token argument must be a bound attribute, not a
    * `tokens(text)` expression: subexpressions referenced inside the
    * transform lambda are re-evaluated per lambda invocation, so an
    * inline split() would rerun the regex once per shingle position
    * (measured 40+ s for 5000 docs vs sub-second materialized).
    */
  def shinglesFromTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(transform(sequence(lit(0), size(t) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*))))
      .otherwise(array_distinct(array(concat_ws(" ", t))))

  /** Word n-gram shingles from raw text — convenience for single-pass
    * use; hot paths should materialize tokens first (see
    * [[shinglesFromTokens]]). */
  def shingles(text: Column, n: Int): Column =
    shinglesFromTokens(tokens(text), n)

  /** Token count (whitespace model). Long-typed for oracle-dtype parity
    * (DuckDB len() is BIGINT). */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Hashing-trick bag-of-words features: (doc_id, bucket, n) sparse
    * counts with bucket = hash(token) mod numBuckets — the fixed-width,
    * vocabulary-free featurization a 100 TB corpus needs (no vocab
    * table to build, broadcast, or keep consistent across shards; the
    * feature space is closed under new data by construction). One
    * explode + one groupBy; map-side combine bounds the shuffle at
    * |docs| x numBuckets rows. The bucket hash is md5-derived (top 15
    * hex digits as a long) because md5 is the one hash this engine and
    * the DuckDB oracle share bit-for-bit; a production swap to
    * xxhash64(token) % k changes one line and only relabels buckets.
    */
  /** (doc_id, bucket) per token — THE hashing-trick featurization
    * shared by [[hashingFeatures]] and [[linearScore]]: the bucket
    * expression is the cross-engine parity contract with the DuckDB
    * oracles AND the train/serve contract between a weight table and
    * the features it was fit on, so it must exist exactly once
    * (review-caught duplication). A production swap to
    * xxhash64(token) % k changes this one expression. */
  private def tokenBuckets(docs: DataFrame, numBuckets: Int): DataFrame =
    docs
      .select(col("doc_id"), explode_outer(tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10)
          .cast("long") % numBuckets).as("bucket"))

  def hashingFeatures(docs: DataFrame, numBuckets: Int): DataFrame =
    tokenBuckets(docs, numBuckets)
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Linear-model inference over the hashing-trick feature space (the
    * fastText-style quality/topic classifier a curation pipeline runs
    * per doc): score = Σ_tokens w(bucket(token)) / n_tokens, with the
    * weight table joined in (broadcast — it is numBuckets rows by
    * construction, the vocabulary-free trick again). Weights are
    * INTEGER milli-units (`w_int`, weight x 1000) so the sum is exact
    * integer arithmetic — no FP association anywhere until the single
    * final divide, which keeps the score bit-identical across engines
    * and partitionings (the editSimilarPairs discipline). The score is
    * emitted as a BIGINT in ten-thousandths (`score_e4` = the mean
    * weight x 10^4, half away from zero): fractional-digit round(x, 4)
    * diverges between engines on the exact .5 boundaries an integer
    * weight grid hits routinely (DuckDB pre-multiplies by 10^4 in
    * double, Spark rounds the exact decimal expansion), while
    * integer-round of one shared IEEE quotient cannot. A trained model
    * drops in as a different weights frame; nothing else moves.
    * Plan: one explode + one broadcast join + one map-side-combined
    * groupBy — same scale shape as [[hashingFeatures]].
    */
  def linearScore(docs: DataFrame, weights: DataFrame,
      numBuckets: Int): DataFrame =
    tokenBuckets(docs, numBuckets)
      .join(broadcast(weights), Seq("bucket"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"),
        round(coalesce(sum(col("w_int")), lit(0L)) * lit(10.0d)
          / count(lit(1))).cast("long").as("score_e4"))

  /** Stopword hit count against a fixed profile — array HOF, no UDF. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column = {
    val set = array(stopwords.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t))).cast("long")
  }

  /** Per-language stopword profiles for the n-gram/stopword language-ID
    * heuristic. Word lists chosen to be disjoint across languages so the
    * argmax is stable. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "que", "por")
  )

  /** Language-ID scores + argmax prediction (ties resolve in profile
    * order). Returns (score columns, predicted column). */
  def langId(text: Column): (Seq[Column], Column) = {
    val scores = langProfiles.map { case (lang, words) =>
      stopwordHits(text, words).as(s"score_$lang")
    }
    val scoreCols = langProfiles.map { case (lang, words) =>
      lang -> stopwordHits(text, words)
    }
    val predicted = scoreCols.tail.foldLeft(
      (scoreCols.head._2, lit(scoreCols.head._1))) {
      case ((bestScore, bestLang), (lang, score)) =>
        (when(score > bestScore, score).otherwise(bestScore),
          when(score > bestScore, lit(lang)).otherwise(bestLang))
    }._2
    (scores, predicted)
  }

  /** Quality metrics: explicit character classes (not POSIX classes —
    * Java regex vs RE2 disagree on those). Ratios rounded for engine
    * parity. */
  def qualityMetrics(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val nChars = length(t).cast("long")
    val nTokens = tokenCount(t)
    val nPunct = nChars - length(regexp_replace(t, "[.,!?;:]", ""))
    val nDigit = nChars - length(regexp_replace(t, "[0-9]", ""))
    val nSpace = nChars - length(regexp_replace(t, " ", ""))
    df.withColumn("n_chars_c", nChars)
      .withColumn("n_tokens", nTokens)
      .withColumn("avg_token_len",
        round((nChars - nSpace).cast("double") / nTokens, 4))
      .withColumn("punct_ratio", round(nPunct.cast("double") / nChars, 4))
      .withColumn("digit_ratio", round(nDigit.cast("double") / nChars, 4))
      .withColumn("stopword_ratio",
        round(stopwordHits(t, langProfiles.head._2).cast("double")
          / nTokens, 4))
  }

  /** Document fingerprint: content hash over whitespace-normalized
    * lowercase text — the canonical-form dedup key. md5 (not xxhash64)
    * so external systems can reproduce it. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Corpus-unigram log-likelihood quality score — the LM-perplexity
    * filter of a pretraining pipeline (CCNet-style), with the corpus
    * itself as the language model: per document, the mean
    * ln-probability of its words under the corpus unigram
    * distribution (avg ln c(w) − ln N, algebraically identical to
    * avg ln(c(w)/N) but numerically cheaper). Outlier docs score low.
    *
    * Plan shape: word counts are one map-side-combined aggregate; the
    * per-doc pass equi-joins words to counts on the word key; the
    * corpus total rides along as a broadcast 1-row frame — no driver
    * collect, and nothing quadratic. Words use the same [^a-z]+ split
    * as vocab building (ReshapeQueries.vocab_topk) so the two share
    * scan shape.
    */
  def unigramLogLik(docs: DataFrame, id: Column, text: Column): DataFrame = {
    // The token stream feeds THREE consumers (the vocab counts, the
    // corpus total via those counts, and the doc-side join), and
    // without a stage each consumer re-scans and RE-TOKENIZES the
    // corpus text (regex split per pass — measured 3 text scans).
    // Staged, the text tokenizes exactly once (PlanShapeSpec-pinned).
    // The staged (doc_id, word) table is ~source-text-sized, so this
    // trades bytes for CPU: one materialization replaces two EXTRA
    // regex-tokenize passes (measured faster at sf0.1; at cluster
    // scale the regex CPU dominates scratch I/O). Contrast
    // boilerplateFraction, where the staged candidate would be ~n x
    // the source bytes and staging loses.
    val words = graft.scale.Staging.materialize(docs
      .select(id.as("doc_id"),
        explode(split(lower(text), "[^a-z]+")).as("word"))
      .filter(col("word") =!= ""), "unigram-words")
    val counts = words.groupBy("word").agg(count(lit(1)).as("c"))
    val total = counts.agg(sum("c").as("n"))
    words.join(counts, "word")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"), col("n"))
      .agg(count(lit(1)).as("n_words"),
        (avg(log(col("c"))) - log(col("n"))).as("ll"))
      .select(col("doc_id"), col("n_words"),
        round(col("ll"), 3).as("avg_loglik"))
  }

  /** PII masking: emails then phone-like digit runs replaced with
    * placeholder tags — the scrub pass a training corpus goes through
    * before anything else sees it. Patterns are deliberately in the
    * RE2-compatible subset (no backrefs/lookarounds) so the same
    * regexes run identically on other engines' regexp_replace.
    */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text,
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+", "<EMAIL>"),
      "\\+?[0-9][0-9-]{6,}[0-9]", "<PHONE>")
}
