package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Curation
import graft.scale.Staging

/** Training-data curation surface: boilerplate n-gram detection,
  * eval-set decontamination, and sequence packing — each oracle-paired
  * (the n-gram generation and the per-shard prefix sum are both
  * expressible in ANSI-ish SQL, so the whole family gets the strong
  * hash-compare gate rather than rows-only).
  */
object CurationQueries {

  private val N = 5        // n-gram width (flat word text; no lines)
  private val MinDocs = 3  // boilerplate = gram in >= 3 distinct docs
  private val Budget = 256 // packing window, tokens
  private val SourceCapN = 10 // per-source document cap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Word 5-grams appearing in >= 3 distinct docs: the removal list of
    // a C4-style repeated-span filter.
    "curation_boilerplate" -> ((s, d) =>
      Curation.boilerplateNgrams(Tables.documents(s, d), N, MinDocs)
        .orderBy(col("n_docs").desc, col("ngram"))),

    // Training docs (source <> 'src0') sharing any 5-gram with the
    // held-out eval slice (source = 'src0'), with shared-gram counts.
    "curation_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Curation.contaminatedDocs(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"), N)
        .orderBy(col("doc_id"))
    }),

    // Cleaning-pass score: share of each doc's distinct 5-grams that
    // are corpus boilerplate.
    "curation_boilerplate_frac" -> ((s, d) =>
      Curation.boilerplateFraction(Tables.documents(s, d), N, MinDocs)
        .orderBy(col("doc_id"))),

    // Substring-dedup signal (Lee et al. 2022): 10-token windows
    // verbatim-shared across >= 2 docs, merged into maximal per-doc
    // token spans — what a substring-dedup pass would cut.
    "curation_repeated_spans" -> ((s, d) =>
      Curation.repeatedSpans(Tables.documents(s, d), w = 10, minDocs = 2)
        .orderBy(col("doc_id"), col("span_start"))),

    // The cut that consumes the spans above: tokens inside flagged
    // spans removed, survivors fingerprinted (NULL = doc fully cut).
    "curation_cut_spans" -> ((s, d) =>
      Curation.removeRepeatedSpans(Tables.documents(s, d), w = 10,
          minDocs = 2)
        .orderBy(col("doc_id"))),

    // Gopher-style repetition signal: duplicate-bigram fraction per doc.
    "curation_doc_repetition" -> ((s, d) =>
      Curation.repetitionRatio(Tables.documents(s, d), 2)
        .orderBy(col("doc_id"))),

    // Concatenate-and-chunk packing into 256-token windows per lang
    // shard: each doc's token offsets and first/last chunk.
    "curation_seq_packing" -> ((s, d) =>
      Curation.packChunks(Tables.documents(s, d), Budget)
        .select(col("lang"), col("doc_id"), col("n_tok"),
          col("tok_start"), col("tok_end"),
          col("first_chunk"), col("last_chunk"))
        .orderBy(col("lang"), col("doc_id"))),

    // Sliding-window chunking with overlap (RAG/embedding prep, the
    // retrieval-side sibling of seq_packing): 200-char chunks every
    // 150 chars, pure explode projection per doc — no shuffle. Chunks
    // travel as (len, md5) so the compare stays narrow.
    "curation_chunk_overlap" -> ((s, d) =>
      Curation.chunkOverlap(Tables.documents(s, d), size = 200,
          stride = 150)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Per-domain cap (RefinedWeb/CCNet-style source limiting): at most
    // `SourceCapN` docs per source, the (n_chars DESC, doc_id ASC)
    // best. Runs through the bounded-heap group_top_n aggregate (O(N)
    // state per source, partial+final — see ops/GroupTopN scaladoc for
    // why a rank window would full-sort a skewed domain at 100 TB);
    // the DuckDB oracle replays the selection with row_number because
    // the aggregate's (priority DESC, id ASC) order is total.
    "curation_source_cap" -> ((s, d) =>
      graft.ops.GroupTopN.capPerGroup(Tables.documents(s, d),
          Seq(col("source")), col("n_chars"), col("doc_id"),
          SourceCapN)
        .select(col("source"), col("id").as("doc_id"),
          col("priority").as("n_chars"))
        .orderBy(col("source"), col("n_chars").desc, col("doc_id"))),

    // FIM objective transform (Bavarian et al. 2022): deterministic
    // prefix/middle/suffix split re-serialized PSM, cut points from
    // the Knuth id hash. Pure projection — no shuffle but the output
    // order.
    "curation_fim_split" -> ((s, d) =>
      Curation.fimSplit(Tables.documents(s, d), col("doc_id"),
          col("text"))
        .orderBy(col("doc_id"))),

    // T5 span corruption (Raffel et al. 2020): block-tiled masking at
    // 15%, numbered sentinels, (input, target) stream fingerprints.
    // One codegen'd projection per doc.
    "curation_span_corruption" -> ((s, d) =>
      Curation.spanCorrupt(Tables.documents(s, d), col("doc_id"),
          col("text"))
        .orderBy(col("doc_id"))),

    // CAPSTONE: the full pre-training corpus build — boilerplate +
    // repetition gates, eval-set decontamination, then per-shard
    // packing of the survivors. The distinct (doc, ngram) table is
    // the shared input of the gates, so it is materialized ONCE
    // (Staging.materialize: eager localCheckpoint locally, a
    // parquet stage on a cluster — see scale/Staging.scala) instead
    // of re-running the explode per gate — the same share-the-scan
    // move a production pipeline makes (naive composition measured
    // 4x slower at sf0.1).
    "pipeline_pretraining_corpus" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // ONE text scan + ONE split computes EVERYTHING the pipeline
      // needs per doc — token count (packing), bigram repetition
      // (quality gate), AND the distinct gram-hash array the gates
      // consume (round 16, session 2; guide §1.2 "remove unnecessary
      // passes"). The round-15 shape read and split text twice
      // (docMeta scalars here, docNgramHashes explode below) and paid
      // a corpus-wide distinct EXCHANGE to dedup (doc, gram) pairs;
      // per-doc dedup is array_distinct inside this projection — no
      // exchange at all (a gram repeated ACROSS docs must stay once
      // per doc, which per-doc dedup preserves exactly).
      // The gram STRING never reaches the output — every consumer
      // counts or joins on it — so grams are hashed at generation
      // (gram_hashes == xxhash64(gram string), GramHashParitySpec):
      // the staged arrays and all gate joins move 8-byte keys, not
      // ~30-byte strings. Collision semantics unchanged from
      // docNgramHashes (see its scaladoc).
      val docMeta = Staging.materialize(
        docs.select(col("doc_id"), col("lang"), col("source"),
            split(col("text"), " ").as("ws"))
          .select(col("doc_id"), col("lang"), col("source"),
            size(col("ws")).cast("long").as("n_tok"),
            Curation.wordNgrams(col("ws"), 2).as("bg"),
            array_distinct(graft.functions.GramHashFunctions
              .gram_hashes(col("ws"), N)).as("gh"))
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_tok"),
            // same arithmetic as Curation.repetitionRatio (long/long
            // divide, round 4) so the oracle SQL stays bit-identical
            when(size(col("bg")) === 0, lit(0.0))
              .otherwise(round(lit(1.0) -
                size(array_distinct(col("bg"))).cast("long") /
                  size(col("bg")).cast("long"), 4))
              .as("rep_ratio"),
            col("gh")),
        "capstone-docmeta")
      // Exploding the STAGED arrays is array iteration, not
      // re-tokenization, so the gram view no longer needs its own
      // stage: each of its two consumers (flag aggregation, gate
      // join) re-explodes the staged frame instead of re-reading a
      // second materialization (one stage write removed). `source`
      // rides the explode rather than joining back from docMeta —
      // the round-7 join broadcast one row per DOCUMENT, a
      // corpus-proportional broadcast that OOMs the driver at 100 TB
      // (the exact growing-broadcast class the gram-flag list below
      // is guarded against).
      val grams = docMeta.select(col("doc_id"), col("source"),
        explode(col("gh")).as("ngram"))
      // Boilerplate and decontamination flag lists FUSED into ONE
      // aggregation over the gram table (n_docs count + any-in-eval
      // in the same groupBy), then both gates applied in ONE
      // left-join + groupBy(doc_id) pass — the unfused plan scanned
      // the staged grams once per gate. The flag list's cardinality
      // grows with the corpus (boilerplate grams are corpus-
      // frequency-defined), so its broadcast is SIZE-GUARDED with a
      // shuffle-join fallback (VERDICT r6 "What's wrong" #2); staged
      // so the guard's count() and the broadcast share one
      // materialization.
      val gramFlags = Staging.materialize(
        grams.groupBy(col("ngram"))
          .agg(count(lit(1)).as("n_docs"),
            max(when(col("source") === "src0", 1)).as("eval_hit"))
          .filter(col("n_docs") >= MinDocs || col("eval_hit") === 1)
          .select(col("ngram"),
            when(col("n_docs") >= MinDocs, 1).as("is_boiler"),
            when(col("eval_hit") === 1, 1).as("is_eval")),
        "capstone-flags")
      val gates = grams
        .join(Staging.guardedBroadcast(gramFlags), Seq("ngram"),
          "left_outer")
        .groupBy(col("doc_id"))
        .agg((count(col("is_boiler")) / count(lit(1))).as("boiler_frac"),
          count(col("is_eval")).as("n_eval_shared"))
      val kept = docMeta.filter(col("source") =!= "src0")
        .join(gates, "doc_id")
        .filter(col("boiler_frac") <= 0.5 && col("rep_ratio") <= 0.3 &&
          col("n_eval_shared") === 0)
        .select(col("lang"), col("doc_id"), col("n_tok"))
      Curation.packTokenCounts(kept, Budget)
        .select(col("lang"), col("doc_id"), col("n_tok"),
          col("tok_start"), col("tok_end"),
          col("first_chunk"), col("last_chunk"))
        .orderBy(col("lang"), col("doc_id"))
    })
  )

  // DuckDB n-gram generation: 1-based inclusive list slices over
  // string_split; generate_series(1, len-4) yields the same positions
  // as the Spark transform(sequence(0, size-5)).
  private val docNgramsSql =
    s"""SELECT DISTINCT doc_id, array_to_string(ws[i:i+${N - 1}], ' ') AS ngram
       |FROM (SELECT doc_id, string_split(text, ' ') AS ws, source
       |      FROM documents) w,
       |  LATERAL (SELECT unnest(generate_series(1, len(ws) - ${N - 1})) AS i) g""".stripMargin

  val oracles: Map[String, String] = Map(
    // The ORACLE may rank-window (it sorts anyway); the registered
    // plan must not — the aggregate's total order (n_chars DESC,
    // doc_id ASC) makes the two selections identical.
    // The inner WHERE mirrors the engine aggregate's null handling:
    // group_top_n skips null-priority/null-id rows, while DuckDB's
    // row_number would rank NULL n_chars rows (NULLS LAST) — on a
    // corpus where a source has fewer than SourceCapN non-null docs
    // plus null-n_chars docs, an unfiltered oracle would include rows
    // the engine drops (round-13 ADVICE).
    "curation_source_cap" ->
      s"""SELECT source, doc_id, n_chars FROM (
         |  SELECT source, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rk
         |  FROM documents
         |  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL)
         |WHERE rk <= $SourceCapN
         |ORDER BY source, n_chars DESC, doc_id""".stripMargin,
    // Same Knuth-hash arithmetic as the sampling oracles (simple
    // single-multiply form — exact for the testdata id ranges; the
    // engine side is the overflow-safe split, bit-identical there).
    "curation_fim_split" ->
      """WITH f AS (SELECT doc_id, text, len(text)::BIGINT AS l,
        |    (doc_id * 2654435761) % 4294967296 AS h1,
        |    ((doc_id + 1000003) * 2654435761) % 4294967296 AS h2
        |  FROM documents),
        |c AS (SELECT doc_id, text, l,
        |    least(h1 % (l + 1), h2 % (l + 1)) AS c1,
        |    greatest(h1 % (l + 1), h2 % (l + 1)) AS c2 FROM f)
        |SELECT doc_id, c1 AS cut1, c2 AS cut2, (c2 - c1) AS n_middle,
        |  md5('<PRE>' || substr(text, 1, c1)
        |    || '<SUF>' || substr(text, c2 + 1, l - c2)
        |    || '<MID>' || substr(text, c1 + 1, c2 - c1)) AS fim_md5
        |FROM c ORDER BY doc_id""".stripMargin,
    // Block piece = 1-based inclusive list slice; sentinel number =
    // cumulative masked blocks BEFORE this one; target string_agg
    // skips unmasked (NULL) pieces and coalesces the no-masked-block
    // doc to '' (Spark's empty-array concat_ws).
    "curation_span_corruption" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents),
        |bl AS (SELECT doc_id, ws, len(ws)::BIGINT AS n,
        |    CAST(ceil(len(ws) / 3.0) AS BIGINT) AS nb FROM t),
        |b AS (SELECT doc_id, ws, n,
        |    unnest(generate_series(0, nb - 1)) AS blk
        |  FROM bl WHERE nb > 0),
        |m AS (SELECT doc_id, ws, n, blk,
        |    ((((doc_id * 131071 + blk) % 4294967296) * 2654435761)
        |      % 4294967296) % 20 < 3 AS masked
        |  FROM b),
        |p AS (SELECT doc_id, n, blk, masked,
        |    array_to_string(ws[blk*3 + 1 : blk*3 + 3], ' ') AS bs,
        |    len(ws[blk*3 + 1 : blk*3 + 3])::BIGINT AS bn,
        |    coalesce(sum(CASE WHEN masked THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY doc_id ORDER BY blk
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS k
        |  FROM m)
        |SELECT doc_id, max(n) AS n_tok,
        |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_spans,
        |  CAST(sum(CASE WHEN masked THEN bn ELSE 0 END) AS BIGINT)
        |    AS n_masked,
        |  md5(string_agg(CASE WHEN masked
        |      THEN '<extra_id_' || k || '>' ELSE bs END,
        |    ' ' ORDER BY blk)) AS input_md5,
        |  md5(coalesce(string_agg(CASE WHEN masked
        |      THEN '<extra_id_' || k || '>' || ' ' || bs END,
        |    ' ' ORDER BY blk), '')) AS target_md5
        |FROM p GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "curation_chunk_overlap" ->
      """SELECT doc_id, CAST(s // 150 AS BIGINT) AS chunk_id,
        |  CAST(len(substr(text, s + 1, 200)) AS BIGINT) AS chunk_len,
        |  md5(substr(text, s + 1, 200)) AS chunk_md5
        |FROM (SELECT doc_id, text,
        |    unnest(generate_series(0, greatest(len(text) - 1, 0), 150))
        |      AS s
        |  FROM documents)
        |ORDER BY doc_id, chunk_id""".stripMargin,
    "curation_boilerplate" ->
      s"""SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs FROM (
         |  $docNgramsSql)
         |GROUP BY ngram HAVING count(*) >= $MinDocs
         |ORDER BY n_docs DESC, ngram""".stripMargin,
    "curation_decontaminate" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, source,
         |    array_to_string(ws[i:i+${N - 1}], ' ') AS ngram
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
         |        FROM documents) w,
         |    LATERAL (SELECT unnest(generate_series(1, len(ws) - ${N - 1})) AS i) g)
         |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM (SELECT * FROM grams WHERE source <> 'src0') t
         |JOIN (SELECT DISTINCT ngram FROM grams WHERE source = 'src0') e
         |  USING (ngram)
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "curation_boilerplate_frac" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, array_to_string(ws[i:i+${N - 1}], ' ') AS ngram
         |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |        FROM documents) w,
         |    LATERAL (SELECT unnest(generate_series(1, len(ws) - ${N - 1})) AS i) g),
         |boiler AS (
         |  SELECT ngram FROM grams GROUP BY ngram
         |  HAVING count(*) >= $MinDocs),
         |per_doc AS (
         |  SELECT g.doc_id, count(*) AS n_grams, count(b.ngram) AS n_boiler
         |  FROM grams g LEFT JOIN boiler b USING (ngram)
         |  GROUP BY g.doc_id)
         |SELECT d.doc_id,
         |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
         |  CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
         |  CASE WHEN coalesce(n_grams, 0) = 0 THEN 0.0
         |       ELSE round(coalesce(n_boiler, 0) / n_grams, 4)
         |  END AS boiler_frac
         |FROM documents d LEFT JOIN per_doc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    // Same window/flag/island arithmetic as Curation.repeatedSpans:
    // 1-based list slices mirror the 0-based posexplode (pos = i-1);
    // islands merge when pos <= running max end (strict > starts one).
    "curation_repeated_spans" ->
      """WITH win AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    md5(array_to_string(ws[i:i+9], ' ')) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) w,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws) - 9)) AS i) g),
        |flagged AS (
        |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
        |  GROUP BY h HAVING count(*) >= 2),
        |hits AS (
        |  SELECT doc_id, pos, pos + 10 AS e FROM win
        |  WHERE h IN (SELECT h FROM flagged)),
        |isl AS (
        |  SELECT doc_id, pos, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS ni
        |  FROM hits),
        |grp AS (
        |  SELECT doc_id, pos, e,
        |    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |  CAST(max(e) AS BIGINT) AS span_end
        |FROM grp GROUP BY doc_id, island
        |ORDER BY doc_id, span_start""".stripMargin,
    // Reuses the span CTE chain, then anti-joins tokens against span
    // containment and re-joins survivors in position order. string_agg
    // over zero rows is NULL — matching the engine's explicit NULL for
    // fully-cut docs.
    "curation_cut_spans" ->
      """WITH win AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
        |    md5(array_to_string(ws[i:i+9], ' ')) AS h
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) w,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws) - 9)) AS i) g),
        |flagged AS (
        |  SELECT h FROM (SELECT DISTINCT doc_id, h FROM win)
        |  GROUP BY h HAVING count(*) >= 2),
        |hits AS (
        |  SELECT doc_id, pos, pos + 10 AS e FROM win
        |  WHERE h IN (SELECT h FROM flagged)),
        |isl AS (
        |  SELECT doc_id, pos, e,
        |    CASE WHEN max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |      OR pos > max(e) OVER (PARTITION BY doc_id ORDER BY pos
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |    THEN 1 ELSE 0 END AS ni
        |  FROM hits),
        |grp AS (
        |  SELECT doc_id, pos, e,
        |    sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |spans AS (
        |  SELECT doc_id, min(pos) AS span_start, max(e) AS span_end
        |  FROM grp GROUP BY doc_id, island),
        |tok AS (
        |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, ws[i] AS tok
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents) w,
        |    LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) g),
        |kept AS (
        |  SELECT t.doc_id, t.pos, t.tok FROM tok t
        |  WHERE NOT EXISTS (SELECT 1 FROM spans s
        |    WHERE s.doc_id = t.doc_id
        |      AND t.pos >= s.span_start AND t.pos < s.span_end))
        |SELECT d.doc_id, CAST(count(k.pos) AS BIGINT) AS n_tok_kept,
        |  md5(string_agg(k.tok, ' ' ORDER BY k.pos)) AS clean_md5
        |FROM documents d LEFT JOIN kept k USING (doc_id)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "curation_doc_repetition" ->
      """SELECT doc_id,
        |  CAST(len(grams) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(grams) = 0 THEN 0.0
        |       ELSE round(1.0 - len(list_distinct(grams)) / len(grams), 4)
        |  END AS rep_ratio
        |FROM (SELECT doc_id,
        |    list_transform(generate_series(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i + 1]) AS grams
        |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
        |        FROM documents))
        |ORDER BY doc_id""".stripMargin,
    "pipeline_pretraining_corpus" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT doc_id, source,
         |    array_to_string(ws[i:i+${N - 1}], ' ') AS ngram
         |  FROM (SELECT doc_id, source, string_split(text, ' ') AS ws
         |        FROM documents) w,
         |    LATERAL (SELECT unnest(generate_series(1, len(ws) - ${N - 1})) AS i) g),
         |boiler AS (
         |  SELECT ngram FROM grams GROUP BY ngram
         |  HAVING count(*) >= $MinDocs),
         |bf AS (
         |  SELECT g.doc_id, count(b.ngram) * 1.0 / count(*) AS boiler_frac
         |  FROM grams g LEFT JOIN boiler b USING (ngram)
         |  GROUP BY g.doc_id),
         |rep AS (
         |  SELECT doc_id,
         |    CASE WHEN len(bg) = 0 THEN 0.0
         |         ELSE 1.0 - len(list_distinct(bg)) / len(bg)
         |    END AS rep_ratio
         |  FROM (SELECT doc_id, list_transform(generate_series(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i + 1]) AS bg
         |    FROM (SELECT doc_id, string_split(text, ' ') AS ws
         |          FROM documents))),
         |contaminated AS (
         |  SELECT DISTINCT t.doc_id
         |  FROM (SELECT * FROM grams WHERE source <> 'src0') t
         |  JOIN (SELECT DISTINCT ngram FROM grams WHERE source = 'src0') e
         |    USING (ngram)),
         |kept AS (
         |  SELECT d.lang, d.doc_id, len(string_split(d.text, ' ')) AS n_tok
         |  FROM documents d
         |  JOIN bf USING (doc_id) JOIN rep USING (doc_id)
         |  WHERE d.source <> 'src0'
         |    AND bf.boiler_frac <= 0.5 AND rep.rep_ratio <= 0.3
         |    AND d.doc_id NOT IN (SELECT doc_id FROM contaminated))
         |SELECT lang, doc_id, CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(tok_end - n_tok AS BIGINT) AS tok_start,
         |  CAST(tok_end AS BIGINT) AS tok_end,
         |  CAST((tok_end - n_tok) // $Budget AS BIGINT) AS first_chunk,
         |  CAST((tok_end - 1) // $Budget AS BIGINT) AS last_chunk
         |FROM (SELECT lang, doc_id, n_tok,
         |    sum(n_tok) OVER (PARTITION BY lang ORDER BY doc_id
         |                     ROWS UNBOUNDED PRECEDING) AS tok_end
         |  FROM kept)
         |ORDER BY lang, doc_id""".stripMargin,
    "curation_seq_packing" ->
      s"""SELECT lang, doc_id,
         |  CAST(n_tok AS BIGINT) AS n_tok,
         |  CAST(tok_end - n_tok AS BIGINT) AS tok_start,
         |  CAST(tok_end AS BIGINT) AS tok_end,
         |  CAST((tok_end - n_tok) // $Budget AS BIGINT) AS first_chunk,
         |  CAST((tok_end - 1) // $Budget AS BIGINT) AS last_chunk
         |FROM (
         |  SELECT lang, doc_id, len(string_split(text, ' ')) AS n_tok,
         |    sum(len(string_split(text, ' ')))
         |      OVER (PARTITION BY lang ORDER BY doc_id
         |            ROWS UNBOUNDED PRECEDING) AS tok_end
         |  FROM documents)
         |ORDER BY lang, doc_id""".stripMargin
  )
}
