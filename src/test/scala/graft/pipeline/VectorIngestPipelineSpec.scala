package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.{vec_dot, vec_norm}
import graft.ops.VectorIndex

/** Streaming IVF ingestion contract: streamed micro-batches join the
  * probed corpus (full-probe results equal brute force over the GROWN
  * corpus), a replayed batch overwrites itself rather than
  * double-ingesting, and delta compaction changes no answer.
  */
class VectorIngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8

  private def emb(id: Long): Seq[Float] =
    (0 until dim).map(j =>
      (((id * 31 + j * 17) % 13).toFloat - 6f) / 6f + 0.05f * (j + 1))

  private def vecsDF(ids: Seq[Long]) =
    ids.map(i => (i, emb(i))).toDF("vec_id", "embedding")

  private def writeJson(dir: String, name: String, ids: Seq[Long]): Unit = {
    val lines = ids.map(i =>
      s"""{"vec_id":$i,"embedding":[${emb(i).mkString(",")}]}""")
    Files.write(Paths.get(dir, name), lines.mkString("\n").getBytes)
  }

  /** Brute-force twin of queryIvf's scoring (same expressions, same
    * rounding, same tie-break) over an explicit corpus. */
  private def brute(corpusIds: Seq[Long], queryIds: Seq[Long], k: Int) = {
    val corpus = vecsDF(corpusIds)
      .select(col("vec_id"), col("embedding"),
        vec_norm(col("embedding")).as("c_norm"))
    val qs = vecsDF(queryIds)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        vec_norm(col("embedding")).as("q_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    qs.crossJoin(corpus)
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(vec_dot(col("q_emb"), col("embedding"))
          / (col("q_norm") * col("c_norm")), 4).as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq
  }

  test("streamed vectors are probed; replay and compaction change nothing") {
    val base = tmpDir("vecingest")
    val idx = s"$base/idx"
    val src = s"$base/src"
    Files.createDirectories(Paths.get(src))
    VectorIndex.buildIvf(vecsDF(0L until 40L), idx,
      numCells = 4, refineIters = 1)

    // two arrival waves, one AvailableNow run each (batch 0 then 1)
    writeJson(src, "b1.json", 40L until 50L)
    VectorIngestPipeline.start(spark, src, idx, s"$base/ck")
      .awaitTermination()
    writeJson(src, "b2.json", 50L until 60L)
    VectorIngestPipeline.start(spark, src, idx, s"$base/ck")
      .awaitTermination()

    val queryIds = Seq(3L, 41L, 57L)
    def ivf() = VectorIndex.queryIvf(spark, idx, vecsDF(queryIds),
        k = 5, nProbe = 4)
      .select(col("query_id"), col("neighbor_id"), col("sim"),
        col("rank"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3)))
      .sortBy(t => (t._1, t._4)).toSeq

    // full probe (nProbe = numCells) must equal brute force over the
    // GROWN corpus — base + both streamed batches
    val expected = brute(0L until 60L, queryIds, k = 5)
    assert(ivf() == expected)

    // replay idempotence: re-land batch 0's data under its own id —
    // the batch dir overwrites itself, answers unchanged
    VectorIngestPipeline.ingestBatch(
      spark.read.schema(VectorIngestPipeline.vecSchema)
        .json(s"$src/b1.json"),
      idx, 0L)
    assert(ivf() == expected, "replayed batch must not double-ingest")

    // compaction folds deltas into the base cells; answers unchanged,
    // delta dir gone
    VectorIngestPipeline.compactDeltas(spark, idx)
    assert(ivf() == expected, "compaction must not change answers")
    assert(!new java.io.File(
      VectorIngestPipeline.deltaDir(idx)).exists())

    // the refreshed fingerprint sees the grown corpus as current: an
    // ensureIvf over the same 60 vectors must NOT trigger a rebuild
    // (probe: centroids file mtimes unchanged)
    val centDir = new java.io.File(s"$idx/centroids")
    val before = centDir.listFiles().map(f =>
      f.getName -> f.lastModified()).toMap
    VectorIndex.ensureIvf(vecsDF(0L until 60L), idx, numCells = 4)
    val after = centDir.listFiles().map(f =>
      f.getName -> f.lastModified()).toMap
    assert(after == before, "ensureIvf must see the grown index as current")
  }

  test("an empty micro-batch is a complete no-op (no batch dir, no " +
      "code dir, no stream crash)") {
    import spark.implicits._
    val idx = tmpDir("vecingest-empty") + "/idx"
    VectorIndex.ensureIvf(vecsDF(0L until 40L), idx, numCells = 4)
    val empty = Seq.empty[(Long, Array[Float])]
      .toDF("vec_id", "embedding")
    // pre-fix this crashed: the encode re-read hit a rows-less batch
    // dir (only _SUCCESS) and schema inference threw, killing the
    // stream; an empty batch must write NOTHING instead
    VectorIngestPipeline.ingestBatch(empty, idx, 7L)
    assert(!new java.io.File(
      s"${VectorIngestPipeline.deltaDir(idx)}/batch=7").exists(),
      "an empty batch must not leave a rows-less delta dir")
    assert(!new java.io.File(VectorIndex.pqDeltaDir(idx)).exists())
    // and the index still answers
    assert(VectorIndex.queryIvf(spark, idx,
      vecsDF(3L until 4L), 5, nProbe = 4).count() == 5)
  }
}
