package graft.pipeline

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Pins the streaming heavy-hitters pipeline: cross-batch
  * accumulation in keyed state, exactness (err_max = 0) below
  * capacity, and checkpoint-driven continuation.
  */
class TopKPipelineSpec extends SparkSpec {

  private def writeTerms(dir: String, file: String,
      rows: Seq[(String, Long)]): Unit = {
    Files.createDirectories(Paths.get(dir))
    val body = rows.map { case (t, w) => s"""{"term":"$t","w":$w}""" }
      .mkString("\n")
    Files.write(Paths.get(dir, file), body.getBytes)
  }

  private def runOnce(src: String, store: String, ck: String): Unit = {
    val q = TopKPipeline.start(spark, src, store, ck,
      capacity = 64, shards = 4)
    q.awaitTermination()
  }

  test("cross-batch accumulation, exact below capacity, ranked snapshot") {
    val base = tmpDir("topkpipe")
    val (src, store, ck) = (s"$base/src", s"$base/store", s"$base/ck")

    writeTerms(src, "b1.json",
      Seq(("alpha", 5L), ("beta", 2L), ("alpha", 1L), ("gamma", 1L)))
    runOnce(src, store, ck)

    writeTerms(src, "b2.json",
      Seq(("beta", 4L), ("delta", 7L), ("alpha", 3L)))
    runOnce(src, store, ck)

    val got = TopKPipeline.snapshot(spark, store, k = 10, capacity = 64)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // alpha 5+1+3=9, delta 7, beta 2+4=6, gamma 1; all exact
    assert(got == Seq(("alpha", 9L, 0L), ("delta", 7L, 0L),
      ("beta", 6L, 0L), ("gamma", 1L, 0L)), s"got $got")
  }

  test("state survives restart: only NEW files fold into the store") {
    val base = tmpDir("topkpipe2")
    val (src, store, ck) = (s"$base/src", s"$base/store", s"$base/ck")

    writeTerms(src, "b1.json", Seq(("x", 1L), ("y", 1L)))
    runOnce(src, store, ck)
    // a fresh AvailableNow run over an UNCHANGED source is a no-op:
    // the checkpoint already covers b1, so counts must not double
    runOnce(src, store, ck)
    writeTerms(src, "b2.json", Seq(("x", 1L)))
    runOnce(src, store, ck)

    val got = TopKPipeline.snapshot(spark, store, k = 10, capacity = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == Map("x" -> 2L, "y" -> 1L), s"got $got")
  }

  test("evicting regime: another shard's floor never inflates a term") {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    // compute the pipeline's own shard assignment, then CONSTRUCT the
    // input: 'heavy' alone in its shard (never evicts, exact), 120
    // distinct singletons all in a DIFFERENT shard (capacity 4 ->
    // evictions, floor > 0). The old mergeIn-based snapshot added the
    // evicting shard's floor to heavy's count and err.
    val shardOf: String => Int = { t =>
      spark.range(1).select(pmod(xxhash64(lit(t)), lit(4)).cast("int"))
        .head().getInt(0)
    }
    val heavy = "heavy"
    val hs = shardOf(heavy)
    val singles = Iterator.from(0).map(i => s"u$i")
      .filter(t => shardOf(t) != hs).take(120).toSeq

    val base = tmpDir("topkpipe4")
    val (src, store, ck) = (s"$base/src", s"$base/store", s"$base/ck")
    writeTerms(src, "b1.json",
      Seq.fill(20)((heavy, 1L)) ++ singles.map(t => (t, 1L)))
    val q = TopKPipeline.start(spark, src, store, ck,
      capacity = 4, shards = 4)
    q.awaitTermination()

    val h = TopKPipeline.snapshot(spark, store, k = 1, capacity = 4)
      .collect().head
    assert(h.getString(0) == heavy)
    assert(h.getLong(1) == 20L && h.getLong(2) == 0L,
      s"heavy inflated: cnt=${h.getLong(1)} err=${h.getLong(2)}")
  }

  test("top-k cut is deterministic under count ties") {
    val base = tmpDir("topkpipe3")
    val (src, store, ck) = (s"$base/src", s"$base/store", s"$base/ck")
    writeTerms(src, "b1.json",
      Seq(("a", 2L), ("b", 2L), ("c", 2L), ("d", 5L)))
    runOnce(src, store, ck)
    val got = TopKPipeline.snapshot(spark, store, k = 2, capacity = 64)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("d", "a"))
  }
}
