package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Pins the greedy-BPE subword tokenizer: training against
  * hand-computed merge tables, encoding against an independent
  * reference implementation (recursive single-merge, obviously
  * correct), the native expression against the driver-side encoder on
  * real corpus text, determinism, and the packing plumbing. The
  * registered `text_token_count_bpe` / `curation_pack_bpe` queries are
  * rows-only (the merge loop is not SQL-expressible), so this spec IS
  * their exactness gate.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reference encoder: apply exactly ONE merge — the
    * lowest-rank adjacent pair, leftmost occurrence — then recurse.
    * Slower and structurally different from Merges.countWord's
    * all-occurrences loop, but provably equivalent for BPE: after the
    * leftmost (a,b) merge, (a,b) is still the lowest-rank pair present
    * until all its occurrences are gone, and left-to-right order is
    * preserved. */
  private def refCount(word: String, m: Bpe.Merges): Int = {
    def step(syms: List[String]): List[String] = {
      val ranked = syms.zip(syms.drop(1)).zipWithIndex
        .flatMap { case ((a, b), i) =>
          Option(m.rankOf.get(Bpe.pairKey(a, b))).map(r => (r.intValue(), i))
        }
      if (ranked.isEmpty) syms
      else {
        val (_, i) = ranked.minBy { case (r, i) => (r, i) }
        step(syms.take(i) ++ List(syms(i) + syms(i + 1)) ++
          syms.drop(i + 2))
      }
    }
    if (word.isEmpty) 0 else step(word.map(_.toString).toList).length
  }

  test("training matches a hand-computed merge table") {
    // corpus: low x5, lower x2, newest x6, widest x3  (Sennrich's
    // canonical example family). Pair counts, round 1:
    //   (e,s): newest 6 + widest 3 = 9  <- best
    //   (s,t): 9, but (e,s) < (s,t) lexicographically? count ties at 9
    // tie-break is lexicographic: ("e","s") < ("s","t") -> (e,s) first
    val hist = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val m = Bpe.train(hist, numMerges = 4)
    assert(m.pairs.length == 4)
    assert(m.pairs(0) == ("e", "s"))   // 9, ties (s,t) 9, lex smaller
    assert(m.pairs(1) == ("es", "t"))  // 9 after es forms
    // next round: (l,o) 7 beats (n,e)/(w,e)... : low 5 + lower 2 = 7
    assert(m.pairs(2) == ("l", "o"))
    assert(m.pairs(3) == ("lo", "w"))  // 7
  }

  test("count-1 pairs are never merged (early stop)") {
    val m = Bpe.train(Seq(("abc", 1L)), numMerges = 10)
    assert(m.pairs.isEmpty)
    assert(m.countWord("abc") == 3) // unmerged word = chars
  }

  test("encoder == independent reference on the trained table, " +
      "including merge-order traps") {
    val m = Bpe.train(Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L), ("aaaa", 4L), ("banana", 3L)), numMerges = 8)
    // hand traps: overlapping merges (aaaa), repeated pairs (banana),
    // unseen words built from seen symbols, single chars, empties
    val words = Seq("low", "lower", "lowest", "newest", "widest",
      "aaaa", "aaa", "aaaaaa", "banana", "bananan", "x", "", "newlow")
    words.foreach { w =>
      assert(m.countWord(w) == refCount(w, m),
        s"mismatch on '$w': got ${m.countWord(w)}, ref ${refCount(w, m)}")
    }
  }

  test("encoder == reference on randomized words over a randomized " +
      "histogram (seeded)") {
    val rnd = new scala.util.Random(7)
    def randWord(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val hist = (0 until 40).map(_ =>
      (randWord(2 + rnd.nextInt(8)), (1 + rnd.nextInt(9)).toLong))
    val m = Bpe.train(hist, numMerges = 12)
    (0 until 200).foreach { _ =>
      val w = randWord(1 + rnd.nextInt(12))
      assert(m.countWord(w) == refCount(w, m), s"mismatch on '$w'")
    }
  }

  test("NUL inside a symbol cannot alias a different trained pair " +
      "(length-prefixed pair keys, round-11 ADVICE)") {
    // distinct pairs whose plain concatenation with a NUL separator
    // collides: ("a<NUL>","b") and ("a","<NUL>b") both flatten to
    // a<NUL><NUL>b. The length prefix disambiguates.
    val N = 0.toChar.toString // NUL, built without a source escape
    assert(Bpe.pairKey("a" + N, "b") != Bpe.pairKey("a", N + "b"))
    // behavior: trained merges are (NUL,b) then ("a<NUL>","b") — the
    // word a<NUL>b first merges (NUL,b), leaving adjacency
    // ("a","<NUL>b") which was NEVER trained. The old concatenated
    // key aliased it to ("a<NUL>","b") rank 1 and wrongly merged to
    // one token; the keyed lookup stops at two.
    val m = Bpe.Merges(Array((N, "b"), ("a" + N, "b")))
    assert(m.encodeWord("a" + N + "b").toSeq == Seq("a", N + "b"))
    assert(m.countWord("a" + N + "b") == 2)
  }

  test("training is deterministic") {
    val hist = Seq(("alpha", 3L), ("beta", 3L), ("gamma", 2L),
      ("delta", 5L))
    val a = Bpe.train(hist, 16).pairs.toSeq
    val b = Bpe.train(hist.reverse, 16).pairs.toSeq
    assert(a == b)
  }

  test("native expression == driver-side encoder over real corpus " +
      "docs; blank/null semantics") {
    val docs = Tables.documents(spark, sf0001)
    val bc = Bpe.ensureMerges(spark, docs, key = sf0001,
      numMerges = 64, vocabCap = 1024)
    val got = docs.select(col("doc_id"),
        Bpe.bpe_token_count(col("text"), bc).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val texts = docs.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    texts.foreach { case (id, t) =>
      assert(got(id) == bc.value.countText(t), s"doc $id diverged")
    }
    // word split parity: whitespace runs, leading/trailing blanks
    val edge = Seq((1L, "  low  lower\tnewest\n"), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    val out = edge.select(col("doc_id"),
        Bpe.bpe_token_count(col("text"), bc).as("n"))
      .orderBy("doc_id").collect().map(_.getLong(1)).toSeq
    assert(out(0) == bc.value.countText("low lower newest"))
    assert(out(1) == 0L && out(2) == 0L)
  }

  test("BPE counts are <= word-char counts and >= word counts " +
      "(subword sanity) on the real corpus") {
    val docs = Tables.documents(spark, sf0001)
    val bc = Bpe.ensureMerges(spark, docs, key = sf0001,
      numMerges = 64, vocabCap = 1024)
    // bounds hold on texts with at least one real word (any
    // non-whitespace char — Spark trim strips only 0x20, so a
    // tab-only doc would slip a trim-based guard); a blank doc counts
    // 0 BPE tokens while word-tokenCount counts its empty-string
    // artifact token (countText scaladoc)
    val bad = docs.filter(col("text").rlike("\\S"))
      .select(
        TextAnalysis.tokenCount(col("text")).as("words"),
        Bpe.bpe_token_count(col("text"), bc).as("bpe"),
        length(regexp_replace(lower(trim(col("text"))), "\\s+", ""))
          .cast("long").as("chars"))
      .filter(col("bpe") < col("words") || col("bpe") > col("chars"))
      .count()
    assert(bad == 0L)
  }

  test("token EMISSION: lossless reconstruction, emission == count, " +
      "expression == driver encoder") {
    val docs = Tables.documents(spark, sf0001)
    val bc = Bpe.ensureMerges(spark, docs, key = sf0001,
      numMerges = 64, vocabCap = 1024)
    // lossless: concatenating a word's subwords reproduces the word
    val m = bc.value
    Seq("low", "lowest", "banana", "aaa", "x", "unseenword").foreach { w =>
      assert(m.encodeWord(w).mkString == w, s"lossy encode of '$w'")
    }
    // ONE collect feeds both views — limit without orderBy carries no
    // determinism guarantee, so two separate limit(50) jobs could
    // admit different rows (review-caught flake hazard)
    val rows = docs.orderBy(col("doc_id")).limit(50)
      .select(col("doc_id"), col("text"),
        Bpe.bpe_tokens(col("text"), bc).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getSeq[String](2)))
    rows.foreach { case (id, t, viaExpr) =>
      // text-level: joined tokens == the lowercased text's words joined
      val lower = t.toLowerCase(java.util.Locale.ROOT)
      val words = lower.split("\\s+").filter(_.nonEmpty).mkString
      assert(m.encodeText(t).mkString == words, s"doc $id lossy")
      assert(m.encodeText(t).length.toLong == m.countText(t),
        s"doc $id emission != count")
      // the expression path agrees with the driver encoder
      assert(viaExpr == m.encodeText(t).toSeq, s"doc $id expr diverged")
    }
  }

  test("packing under a BPE budget: windows respect the budget and " +
      "chunk ids are consistent with offsets") {
    val docs = Tables.documents(spark, sf0001)
    val bc = Bpe.ensureMerges(spark, docs, key = sf0001,
      numMerges = 64, vocabCap = 1024)
    val budget = 256
    val packed = Curation.packTokenCounts(
      docs.select(col("lang"), col("doc_id"),
        Bpe.bpe_token_count(col("text"), bc).as("n_tok")), budget)
    val rows = packed.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s, e) = (r.getAs[Long]("n_tok"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("tok_end"))
      assert(e - s == n)
      assert(r.getAs[Long]("first_chunk") == s / budget)
      assert(r.getAs[Long]("last_chunk") == (e - 1) / budget)
    }
    // offsets form a dense prefix sum per shard
    rows.groupBy(_.getAs[String]("lang")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      sorted.foldLeft(0L) { (cursor, r) =>
        assert(r.getAs[Long]("tok_start") == cursor)
        r.getAs[Long]("tok_end")
      }
    }
  }
}
