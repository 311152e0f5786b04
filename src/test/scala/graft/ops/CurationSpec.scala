package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("wordNgrams matches a driver-side recompute; short docs yield none") {
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c"), // shorter than n=5 -> zero grams, not garbage
      (3L, "x x x x x x x") // repeats -> repeated grams pre-distinct
    ).toDF("doc_id", "text")
    val got = Curation.docNgrams(df, 5)
      .orderBy("doc_id", "ngram").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = Seq(
      (1L, "a b c d e"), (1L, "b c d e f"),
      (3L, "x x x x x"))
    assert(got.toSeq == expected)
  }

  test("boilerplate: a span planted in k docs surfaces iff k >= minDocs") {
    val boiler = "one two three four five"
    val df = Seq(
      (1L, s"q w e $boiler r t"),
      (2L, s"$boiler z z z z"),
      (3L, s"m n b v c $boiler"),
      (4L, "only unique words here nothing shared at all"),
      (5L, "another fully distinct document with its own span")
    ).toDF("doc_id", "text")
    val hits = Curation.boilerplateNgrams(df, 5, minDocs = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(hits.get(boiler).contains(3L),
      s"planted 3-doc span missing from $hits")
    // nothing else reaches 3 docs
    assert(hits.keys.forall(_.split(" ").toSet.subsetOf(
      "one two three four five".split(" ").toSet)))
  }

  test("boilerplate fraction: shared-span docs score, unique docs zero") {
    val boiler = "one two three four five six seven eight"
    val df = Seq(
      (1L, boiler),                                   // pure boilerplate
      (2L, s"$boiler plus some unique trailing words"),
      (3L, s"prefix words here then $boiler"),
      (4L, "a wholly original document with no shared span inside it")
    ).toDF("doc_id", "text")
    val got = Curation.boilerplateFraction(df, 5, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    // the 4 grams of `boiler` appear in docs 1,2,3 -> boilerplate;
    // doc 1 is 100% boilerplate, doc 4 has none
    assert(got(0) == (1L, 1.0))
    assert(got(1)._2 > 0.0 && got(1)._2 < 1.0)
    assert(got(2)._2 > 0.0 && got(2)._2 < 1.0)
    assert(got(3) == (4L, 0.0))
  }

  test("decontamination flags exactly the train docs sharing eval grams") {
    val eval = Seq((100L, "held out benchmark question answer pair text"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "leaked copy benchmark question answer pair text inside"),
      (2L, "completely unrelated training document about other things")
    ).toDF("doc_id", "text")
    val flagged = Curation.contaminatedDocs(train, eval, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // doc 1 shares the 5-grams "benchmark question answer pair text"
    // window ("leaked copy benchmark question answer" is not in eval)
    assert(flagged.toSeq == Seq((1L, 1L)), flagged.toSeq.toString)
  }

  test("repetition ratio: looping text scores high, unique text zero") {
    val df = Seq(
      (1L, "a b a b a b a b"),   // bigrams: a b, b a alternating -> 7 grams, 2 distinct
      (2L, "q w e r t y u i"),   // all unique
      (3L, "solo")               // shorter than n -> 0 grams, ratio 0
    ).toDF("doc_id", "text")
    val got = Curation.repetitionRatio(df, 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      (1L, 7L, 2L, 0.7143), (2L, 7L, 7L, 0.0), (3L, 0L, 0L, 0.0)))
  }

  test("packing invariants on the real table: contiguous per-shard offsets") {
    val docs = Tables.documents(spark, sf0001)
    val packed = Curation.packChunks(docs, 256)
      .orderBy("lang", "doc_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(packed.nonEmpty)
    packed.groupBy(_._1).foreach { case (_, rows) =>
      // offsets tile the shard: each doc starts where the previous ended
      rows.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._5, s"gap between $a and $b")
        case _ =>
      }
      assert(rows.head._4 == 0L)
      rows.foreach { case (_, _, nTok, start, end, first, last) =>
        assert(end - start == nTok)
        assert(first == start / 256 && last == (end - 1) / 256)
        // a doc spans ceil(nTok/256)+1 chunks at most
        assert(last - first <= nTok / 256 + 1)
      }
    }
    // shard totals: max tok_end per lang == sum of its token counts
    val byLang = packed.groupBy(_._1)
    byLang.foreach { case (_, rows) =>
      assert(rows.map(_._3).sum == rows.map(_._5).max)
    }
  }

  test("chunkOverlap: stride coverage, overlap, md5 of exact substrings") {
    // len 500 @ size 200 / stride 150 -> starts 0,150,300,450 with
    // lengths 200,200,200,50; consecutive chunks overlap by 50.
    val text = (0 until 500).map(i => ('a' + (i % 26)).toChar).mkString
    val df = Seq((7L, text)).toDF("doc_id", "text")
    val got = Curation.chunkOverlap(df, size = 200, stride = 150)
      .orderBy("chunk_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.map(x => (x._1, x._2)).toSeq ===
      Seq((0L, 200L), (1L, 200L), (2L, 200L), (3L, 50L)))
    got.foreach { case (cid, _, h) =>
      val sub = text.substring((cid * 150).toInt,
        math.min(cid * 150 + 200, 500).toInt)
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(sub.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(h === want, s"chunk $cid hash mismatch")
    }
    // full coverage: chunk starts tile [0, len) with stride <= size
    val ends = got.map(x => x._1 * 150 + x._2)
    assert(ends.max === 500L)
  }

  test("chunkOverlap: null and empty texts yield no chunks") {
    val df = Seq((1L, Option("abc")), (2L, Option("")), (3L, None))
      .toDF("doc_id", "text")
    val got = Curation.chunkOverlap(df, size = 200, stride = 150)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(1L),
      "only the non-empty doc may emit chunks — null text must not " +
        "produce a null-md5 row, empty text must not produce an empty chunk")
  }

  test("repeatedSpans: shared 12-token run merges into one maximal span") {
    // doc 1 carries the run at token positions 5..16, doc 2 at 0..11;
    // all other tokens are unique so no accidental windows collide.
    val run = (0 until 12).map(i => s"shared$i").mkString(" ")
    val d1 = ((0 until 5).map(i => s"a$i") :+ run) ++
      (0 until 3).map(i => s"b$i")
    val d2 = run +: (0 until 8).map(i => s"c$i")
    val docs = Seq(
      (1L, d1.mkString(" ")), (2L, d2.mkString(" "))
    ).toDF("doc_id", "text")
    val got = Curation.repeatedSpans(docs, w = 10, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // 12-token run -> three 10-token windows -> ONE merged span of 12
    assert(got == Set((1L, 5L, 17L), (2L, 0L, 12L)))

    // a doc repeating the run INTERNALLY only is not flagged at
    // minDocs=2 cross-doc counting (distinct-doc count stays 1)
    val intra = Seq((9L, (run + " " + run))).toDF("doc_id", "text")
    assert(Curation.repeatedSpans(intra, w = 10, minDocs = 2)
      .collect().isEmpty)

    // the cut: exactly the span tokens are removed, survivors keep
    // their relative order; a fully-covered doc fingerprints NULL
    val cut = Curation.removeRepeatedSpans(docs, w = 10, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toMap
    val d1Clean = ((0 until 5).map(i => s"a$i") ++
      (0 until 3).map(i => s"b$i")).mkString(" ")
    val d2Clean = (0 until 8).map(i => s"c$i").mkString(" ")
    assert(cut(1L)._1 == 8L &&
      cut(1L)._2 == java.security.MessageDigest.getInstance("MD5")
        .digest(d1Clean.getBytes).map("%02x".format(_)).mkString)
    assert(cut(2L)._1 == 8L &&
      cut(2L)._2 == java.security.MessageDigest.getInstance("MD5")
        .digest(d2Clean.getBytes).map("%02x".format(_)).mkString)
    // two exact-duplicate docs: every window shared -> fully cut
    val dups = Seq((7L, run), (8L, run)).toDF("doc_id", "text")
    val cutDups = Curation.removeRepeatedSpans(dups, 10, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSet
    assert(cutDups == Set((7L, 0L, true), (8L, 0L, true)))
  }

  test("removeRepeatedSpans: NULL text takes the (0, NULL) path") {
    // split(NULL) is NULL; unguarded it propagated through filter()
    // into n_tok_kept = -1 (size-of-null) and clean_md5 = md5('')
    // (concat_ws null-swallowing) — the oracle's LEFT JOIN yields
    // (0, NULL), i.e. "nothing left — drop the doc", same as a fully
    // cut doc. Current corpora carry no NULL text, so this pins the
    // latent seam.
    val docs = Seq((1L, Option("plain short doc")), (2L, None))
      .toDF("doc_id", "text")
    val got = Curation.removeRepeatedSpans(docs, w = 10, minDocs = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.isNullAt(2))).toSet
    assert(got == Set((1L, 3L, false), (2L, 0L, true)),
      s"NULL text must yield (0, NULL): $got")
  }

  // driver-side Knuth hash, the simple single-multiply form — exact
  // for the small ids used here (the engine side is the overflow-safe
  // split, bit-identical in this range)
  private def knuth(id: Long): Long =
    ((id % 4294967296L) * 2654435761L) % 4294967296L

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  test("fimSplit: independent driver-side replay of cuts and md5") {
    val docs = Seq((1L, "hello brave new world of infill"),
      (2L, ""), (7L, "x")).toDF("doc_id", "text")
    val got = Curation.fimSplit(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(4))).toSeq
    val expect = Seq((1L, "hello brave new world of infill"),
      (2L, ""), (7L, "x")).map { case (id, text) =>
      val l = text.length.toLong
      val a = knuth(id) % (l + 1)
      val b = knuth(id + 1000003L) % (l + 1)
      val (c1, c2) = (math.min(a, b), math.max(a, b))
      val fim = "<PRE>" + text.substring(0, c1.toInt) +
        "<SUF>" + text.substring(c2.toInt) +
        "<MID>" + text.substring(c1.toInt, c2.toInt)
      (id, c1, c2, md5Hex(fim))
    }
    assert(got == expect)
  }

  test("spanCorrupt: reconstruction — input with sentinels replaced " +
      "by their target spans rebuilds the original text") {
    // drive the real corpus slice: reconstruct via the SAME driver
    // replay that defines the expected streams, then assert both
    // md5s AND the rebuilt text
    val docs = Tables.documents(spark, sf0001).limit(50)
      .select(col("doc_id"), col("text"))
    val got = Curation.spanCorrupt(docs, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toMap
    val local = docs.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var sawMasked = false
    var sawUnmasked = false
    local.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val blocks = toks.grouped(3).toArray
      val masked = blocks.indices
        .filter(b => knuth(id * 131071L + b) % 20 < 3)
      val sentinel = masked.zipWithIndex.map { case (b, k) =>
        b -> s"<extra_id_$k>"
      }.toMap
      val input = blocks.indices.flatMap(b =>
        if (sentinel.contains(b)) Seq(sentinel(b)) else blocks(b).toSeq)
        .mkString(" ")
      val target = masked.flatMap(b => sentinel(b) +: blocks(b).toSeq)
        .mkString(" ")
      val (nTok, nSpans, nMasked, inMd5, tgtMd5) = got(id)
      assert(nTok == toks.length.toLong)
      assert(nSpans == masked.size.toLong)
      assert(nMasked == masked.map(blocks(_).length).sum.toLong)
      assert(inMd5 == md5Hex(input), s"doc $id input stream")
      assert(tgtMd5 == md5Hex(target), s"doc $id target stream")
      // the objective's soundness: splicing every target span back
      // over its sentinel reproduces the original token stream
      val spans = masked.map(b => sentinel(b) -> blocks(b)).toMap
      val rebuilt = input.split(" ", -1).flatMap(t =>
        spans.get(t).map(_.toSeq).getOrElse(Seq(t))).mkString(" ")
      assert(rebuilt == text, s"doc $id reconstruction")
      if (masked.nonEmpty) sawMasked = true
      if (masked.size < blocks.length) sawUnmasked = true
    }
    // the corpus slice must actually exercise both regimes
    assert(sawMasked && sawUnmasked)
  }

  test("spanCorrupt: partition-invariant and deterministic") {
    val docs = Tables.documents(spark, sf0001).limit(40)
      .select(col("doc_id"), col("text"))
    val a = Curation.spanCorrupt(docs.repartition(1), col("doc_id"),
      col("text")).orderBy("doc_id").collect().map(_.toSeq).toSeq
    val b = Curation.spanCorrupt(docs.repartition(7), col("doc_id"),
      col("text")).orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
