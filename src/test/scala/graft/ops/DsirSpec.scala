package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins [[Sampling.dsirSelect]] — DSIR importance resampling — on a
  * planted two-domain corpus: target-vocabulary docs must outscore
  * raw-vocabulary docs, the selection must be the deterministic top-k,
  * and the whole computation must be partition-invariant (the
  * engine-wide reproducibility contract).
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // Two disjoint vocabularies: "target" docs speak tq/tw/te, "noise"
  // docs speak nq/nw/ne; "mixed" docs interleave. Target slice =
  // src 't'.
  private lazy val docs = (
    (1L to 10L).map(i => (i, "tq tw te tq tw te tq", "t")) ++
    (11L to 20L).map(i => (i, "nq nw ne nq nw ne nq", "r")) ++
    (21L to 25L).map(i => (i, "tq tw nq nw tq tw te", "r")) ++
    // a raw doc that SPEAKS the target vocabulary — the doc DSIR
    // exists to find
    Seq((30L, "tq tw te tw tq te tw", "r"),
      (31L, "", "r")) // gramless: must drop out, not crash
  ).toDF("doc_id", "text", "source")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    Sampling.dsirSelect(df, col("doc_id"), col("text"),
        col("source") === "t", 4096, k)
      .orderBy(col("doc_id"))
      .collect().toSeq

  test("target-vocabulary docs outscore noise-vocabulary docs") {
    val out = run(docs, 5)
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(2), r.getInt(3))).toMap
    // the target-speaking raw doc scores above every noise doc
    val noiseMax = (11L to 20L).map(byId(_)._1).max
    assert(byId(30L)._1 > noiseMax)
    // mixed docs land between pure-target and pure-noise
    val mixed = byId(21L)._1
    assert(mixed > noiseMax && mixed < byId(1L)._1)
    // the gramless doc is absent
    assert(!byId.contains(31L))
  }

  test("selection is the exact top-k under (weight DESC, doc_id ASC)") {
    val out = run(docs, 5)
    val selected = out.filter(_.getInt(3) == 1).map(_.getLong(0)).toSet
    val expect = out.map(r => (r.getDouble(2), r.getLong(0)))
      .sortBy { case (w, id) => (-w, id) }.take(5).map(_._2).toSet
    assert(selected == expect)
    assert(selected.size == 5)
  }

  test("partition-invariant: 1 vs 8 partitions, identical rows") {
    val a = run(docs.repartition(1), 5).map(_.toSeq)
    val b = run(docs.repartition(8), 5).map(_.toSeq)
    assert(a == b)
  }

  test("k past the corpus selects every scored doc") {
    val out = run(docs, 1000)
    assert(out.forall(_.getInt(3) == 1))
  }

  test("persisted-LM scorer == dsirSelect weights on the fitting corpus") {
    val store = tmpDir("dsir-store")
    Sampling.dsirFitStore(docs, col("doc_id"), col("text"),
      col("source") === "t", 4096, store)
    val viaStore = Sampling.dsirScoreStore(docs, col("doc_id"),
        col("text"), store)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaSelect = run(docs, 5)
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(viaStore == viaSelect)
  }

  test("LM memo: repeat scores hit the cache with identical results; " +
      "a refit changes the stamp and misses cleanly") {
    val store = tmpDir("dsir-store-memo")
    Sampling.dsirFitStore(docs, col("doc_id"), col("text"),
      col("source") === "t", 4096, store)
    def score() = Sampling.dsirScoreStore(docs, col("doc_id"),
        col("text"), store)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val h0 = Sampling.dsirLmHits.get()
    val m0 = Sampling.dsirLmMisses.get()
    val first = score()
    val second = score()
    assert(second == first, "cached replay must be bit-identical")
    // first call may hit or miss depending on suite order (the memo
    // is per-JVM); the SECOND call against an unchanged store must hit
    assert(Sampling.dsirLmHits.get() >= h0 + 1)
    // retrain on a flipped target: stamp changes (fresh mtimes), the
    // memo misses, and the new weights reflect the retrain — a stale
    // cache would keep serving the old LM
    Thread.sleep(5) // mtime granularity guard
    Sampling.dsirFitStore(docs, col("doc_id"), col("text"),
      col("source") === "r", 4096, store)
    val refit = score()
    assert(Sampling.dsirLmMisses.get() >= m0 + 1)
    assert(refit != first,
      "refit with a flipped target must change the served weights")
  }

  test("novel grams score exactly the smoothing constant") {
    val store = tmpDir("dsir-store-novel")
    Sampling.dsirFitStore(docs, col("doc_id"), col("text"),
      col("source") === "t", 4096, store)
    val meta = spark.read.parquet(s"$store/meta").head()
    val (t, r) = (meta.getAs[Long]("t_total"), meta.getAs[Long]("r_total"))
    val const = math.log(r + 4096.0) - math.log(t + 4096.0)
    val novel = Seq((100L, "zz yy xx ww vv")).toDF("doc_id", "text")
    val got = Sampling.dsirScoreStore(novel, col("doc_id"), col("text"),
      store).head()
    // every gram hits an unoccupied bucket (the planted vocab is tiny
    // vs 4096 slots): per-occurrence contribution ln(1)-ln(1)=0, so
    // the weight is the corpus-size constant alone
    assert(got.getDouble(2) ==
      BigDecimal(const).setScale(3, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    assert(got.getLong(1) == 9L) // 5 unigrams + 4 bigrams
  }
}
