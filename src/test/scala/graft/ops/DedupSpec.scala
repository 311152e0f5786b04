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
}
