package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog today"),
    (1L, "the quick brown fox jumps over the lazy dog today"), // exact dup
    (2L, "the quick brown fox jumps over the lazy cat today"), // near dup
    (3L, "completely different text about spark engines here now"),
    (4L, "THE  Quick   Brown fox jumps over the lazy dog today") // ws/case
  ).toDF("doc_id", "text")

  test("exactGroups collapses canonical-form duplicates") {
    val groups = Dedup.exactGroups(docs).collect()
    val dupGroup = groups.filter(_.getLong(1) == 3L)
    assert(dupGroup.length == 1, "docs 0,1,4 share a canonical form")
    assert(dupGroup.head.getLong(2) == 0L, "keeper is min doc_id")
    assert(groups.length == 3)
  }

  test("jaccardPairs finds the near dup and not the distinct doc") {
    val pairs = Dedup.jaccardPairs(docs, n = 3, t = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((0L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minHashDedup == exact jaccardPairs on real documents (LSH recall)") {
    val real = Tables.documents(spark, sf0001)
    val exact = Dedup.jaccardPairs(real, 3, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minHashDedup(real, 3, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "testdata should contain planted near-dups")
    assert(lsh == exact)
  }

  test("simHashPairs: candidates within hamming bound are true near-dups") {
    val real = Tables.documents(spark, sf0001)
    val exact = Dedup.jaccardPairs(real, 3, 0.7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sim = Dedup.simHashPairs(real, maxDist = 7)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert(sim.subsetOf(exact),
      s"simhash false positives: ${(sim -- exact).take(5)}")
  }

  test("editSimilarPairs: hand cases, boundary pair, lossless prefilter") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // base, 43 ch
      (2L, "the quick brown fax jumps over the lazy dog"), // 1 edit
      (3L, "a completely different document body here ok"), // far
      // exactly at t=0.9: 40 chars vs 36-char prefix -> lev=4,
      // sim = 1 - 4/40 = 0.9 — must be kept (>= is inclusive)
      (4L, "0123456789012345678901234567890123456789"),
      (5L, "012345678901234567890123456789012345")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editSimilarPairs(docs, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (4L, 5L)))
    // prefilter losslessness on real data: every pair the unfiltered
    // (cross) formulation keeps survives the length prefilter
    val real = Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 100)
    val filtered = Dedup.editSimilarPairs(real, 0.85)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = real.as("a").join(real.as("b"),
        $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        round(lit(1.0) - levenshtein($"a.text", $"b.text").cast("double")
          / greatest(length($"a.text"), length($"b.text")), 4).as("s"))
      .filter($"s" >= 0.85)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(filtered == naive)
  }

  test("editSimilarPairs: rounding slack scales with doc length") {
    import spark.implicits._
    // round(sim,4) >= t admits lev up to (1-t+5e-5) x maxLen; past
    // ~40k chars that half-ulp exceeds any constant band widening, so
    // both the prefilter and the DP band must budget 5e-5 x maxLen
    // explicitly. 80k chars, t=0.999: admissible lev = 84
    // (sim = 1 - 84/80000 = 0.99895 -> rounds to 0.9990 >= t), but
    // the old floor((1-t)L)+2 = 82 band pruned the pair.
    val base = "a" * 80000
    val edited = {
      val b = base.toCharArray
      (0 until 84).foreach(i => b(i * 900) = 'b') // lev = 84 substitutions
      new String(b)
    }
    val pairs = Dedup.editSimilarPairs(
      Seq((1L, base), (2L, edited)).toDF("doc_id", "text"), 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0.999)),
      s"exactly-at-rounded-threshold long pair must survive: ${pairs.toSeq}")
  }

  test("editSimilarPairs composes with LSH candidates at scale") {
    // the 100 TB shape: LSH candidate pairs -> edit verification only
    // on candidates. Every verified pair must also be found by the
    // exhaustive formulation (no false positives from the composition).
    val real = Tables.documents(spark, sf0001)
    val cand = Dedup.minHashCandidates(real, 3)
    val docsKv = real.select(col("doc_id"), col("text"))
    val verified = cand
      .join(docsKv.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("text", "text_a"), "doc_a")
      .join(docsKv.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("text", "text_b"), "doc_b")
      .filter(round(lit(1.0) -
        levenshtein(col("text_a"), col("text_b")).cast("double") /
          greatest(length(col("text_a")), length(col("text_b"))), 4)
        >= 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exhaustive = Dedup.editSimilarPairs(real, 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(verified.nonEmpty, "planted near-dups should verify")
    assert(verified.subsetOf(exhaustive))
  }
}
