package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic sampling: disjoint/exhaustive split near the target
  * rate, stable across runs, stratified caps respected.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = spark.range(0, 10000).select(col("id"))

  test("train/test split is disjoint, exhaustive, near 80/20, stable") {
    val split = Sampling.trainTestSplit(ids, col("id"), 80)
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000)
    // Knuth hash scatters uniformly: within ±2% of target on 10k ids
    assert(math.abs(counts("train") - 8000L) < 200,
      s"train=${counts("train")}")
    // deterministic: a second evaluation yields identical membership
    val again = Sampling.trainTestSplit(ids, col("id"), 80)
    assert(split.exceptAll(again).isEmpty)
  }

  test("sampleFraction keeps ~num/denom deterministically") {
    val kept = Sampling.sampleFraction(ids, col("id"), 1, 10)
    val n = kept.count()
    assert(math.abs(n - 1000L) < 100, s"n=$n")
    assert(kept.exceptAll(
      Sampling.sampleFraction(ids, col("id"), 1, 10)).isEmpty)
    // subset property: the 10% sample is inside the 20% sample
    val wider = Sampling.sampleFraction(ids, col("id"), 2, 10)
    assert(kept.exceptAll(wider).isEmpty)
  }

  test("stratifiedFixedN caps each stratum at n, keeps small strata") {
    val df = ids.withColumn("g", col("id") % 7)
    val out = Sampling.stratifiedFixedN(df, col("g"), col("id"), 5)
    val per = out.groupBy("g").count().as[(Long, Long)].collect().toMap
    assert(per.size == 7 && per.values.forall(_ == 5L))
    // a stratum smaller than n survives whole
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b"))
      .toDF("id", "g")
    val outTiny = Sampling.stratifiedFixedN(tiny, col("g"), col("id"), 5)
    assert(outTiny.count() == 3)
  }

  test("mixtureSample approaches target shares; anchor domain kept whole") {
    val docs = graft.Tables.documents(spark, sf0001)
    val tok = size(split(col("text"), " ")).cast("long")
    val targets = Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.15,
      "de" -> 0.15, "fr" -> 0.1)
    val kept = Sampling.mixtureSample(docs, col("lang"), col("doc_id"),
      tok, targets)
    val mix = kept.groupBy("lang").agg(sum(tok).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = mix.values.sum.toDouble
    // realized shares within a few points of targets (hash granularity
    // + doc-size quantization), and nothing up-sampled: every domain's
    // kept weight <= its full weight
    val full = docs.groupBy("lang").agg(sum(tok).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (d, s) =>
      val realized = mix.getOrElse(d, 0L) / total
      assert(math.abs(realized - s) <= 0.06,
        s"$d realized $realized vs target $s")
      assert(mix.getOrElse(d, 0L) <= full(d))
    }
    // the anchor domain (max weight-to-target ratio deficit) is kept ~whole
    val anchor = targets.keys.minBy(d => full(d) / targets(d))
    assert(mix(anchor) == full(anchor), s"anchor $anchor was down-sampled")
    // deterministic: second run identical
    val again = Sampling.mixtureSample(docs, col("lang"), col("doc_id"),
        tok, targets)
      .groupBy("lang").agg(sum(tok).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == mix)
  }

  test("mixtureSample under BPE weights: shares approach targets in " +
      "SUBWORD-token mass, population equals a driver-weighted run") {
    val docs = graft.Tables.documents(spark, sf0001)
    val bc = Bpe.ensureMerges(spark, docs, key = sf0001,
      numMerges = 64, vocabCap = 1024)
    val tok = Bpe.bpe_token_count(col("text"), bc)
    val targets = Map("en" -> 0.4, "zh" -> 0.2, "es" -> 0.15,
      "de" -> 0.15, "fr" -> 0.1)
    val kept = Sampling.mixtureSample(docs, col("lang"), col("doc_id"),
      tok, targets)
    val mix = kept.groupBy("lang").agg(sum(tok).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = mix.values.sum.toDouble
    targets.foreach { case (d, s) =>
      val realized = mix.getOrElse(d, 0L) / total
      assert(math.abs(realized - s) <= 0.06,
        s"$d realized $realized vs target $s (BPE mass)")
    }
    // differential: the sampler is a pure function of per-domain
    // weight totals + ids, so feeding DRIVER-computed BPE counts
    // (the independent countText path) must keep the same population
    import spark.implicits._
    val driverCounts = docs.select(col("doc_id"), col("lang"),
        col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        bc.value.countText(r.getString(2)))).toSeq
      .toDF("doc_id", "lang", "n_tok")
    val keptIds = kept.select("doc_id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val driverIds = Sampling.mixtureSample(driverCounts, col("lang"),
        col("doc_id"), col("n_tok"), targets)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(keptIds == driverIds)
  }

  test("hashKey is overflow-safe over the full long domain and equals " +
      "the exact (id mod 2^32) * K mod 2^32 reference") {
    // the naive single multiply wraps negative above ~3.47e9 and
    // would land those ids in EVERY sample slab (review-caught)
    val K = BigInt(2654435761L)
    val M = BigInt(4294967296L)
    val probes = Seq(0L, 1L, 7L, 3470000000L, 4000000000L,
      4294967296L, 1000000000000000000L, Long.MaxValue)
    val got = probes.toDF("id")
      .select(Sampling.hashKey(col("id")).as("k"))
      .collect().map(_.getLong(0))
    val want = probes.map(id => (BigInt(id).mod(M) * K).mod(M).toLong)
    assert(got.toSeq == want)
    assert(got.forall(k => k >= 0L && k < 4294967296L))
  }

  test("epochKey: reproducible per epoch, distinct orders across epochs") {
    val docs = (0L until 200L).toDF("id")
    def order(epoch: Int): Seq[Long] = docs
      .withColumn("k", Sampling.epochKey(col("id"), lit(epoch)))
      .orderBy(col("k"), col("id")).select("id")
      .collect().map(_.getLong(0)).toSeq
    val e1a = order(1)
    val e1b = order(1)
    val e2 = order(2)
    assert(e1a == e1b, "same epoch must give the identical order")
    assert(e1a != e2, "different epochs must permute differently")
    assert(e1a.sorted == (0L until 200L), "a permutation, not a filter")
    val keys = docs.withColumn("k", Sampling.epochKey(col("id"), lit(7)))
      .select("k").collect().map(_.getLong(0))
    assert(keys.forall(k => k >= 0L && k < 4294967296L))
  }

  test("writeEpochShards: shard-concatenated order replays the global " +
      "epoch permutation without a global sort") {
    import graft.Tables
    val docs = Tables.documents(spark, sf0001).select("doc_id", "lang")
    val path = tmpDir("epoch-shards")
    Sampling.writeEpochShards(docs, col("doc_id"), epoch = 1,
      shards = 4, path = path)
    val back = spark.read.parquet(path)
    assert(back.count() == 500, "shards must partition the corpus")
    // every row sits in its key-range shard
    val misplaced = back.filter(
      (col("shuffle_key") * 4 / lit(4294967296L)).cast("int")
        =!= col("shard")).count()
    assert(misplaced == 0)
    // concatenating shards 0..3 (each re-sorted by its carried key)
    // replays the direct global ordering exactly
    val replayed = (0 until 4).flatMap { sh =>
      back.filter(col("shard") === sh)
        .orderBy(col("shuffle_key"), col("doc_id"))
        .select("doc_id").collect().map(_.getLong(0))
    }
    val direct = docs
      .orderBy(Sampling.epochKey(col("doc_id"), lit(1)), col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(replayed == direct)
  }

  test("writeEpochShards: non-power-of-two shard counts stay in range") {
    import graft.Tables
    val docs = Tables.documents(spark, sf0001).select("doc_id")
    val path = tmpDir("epoch-shards6")
    Sampling.writeEpochShards(docs, col("doc_id"), epoch = 2,
      shards = 6, path = path)
    val back = spark.read.parquet(path)
    assert(back.count() == 500)
    val shards = back.select("shard").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(shards.forall(s => s >= 0 && s < 6),
      s"out-of-range shard in ${shards.toSeq}")
  }
}
