package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment: attribute retrieval_service_cap's cost between its
  * lexical (batched indexed BM25) and dense (batched IVF probe) halves
  * plus fusion, at bench conditions, with per-stage decomposition so
  * an optimization round can see WHERE inside each half the time goes.
  */
object CapExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SCRATCH_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_PARTS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SCRATCH_OHA_FALLBACK").foreach(v =>
      spark.conf.set(
        "spark.sql.objectHashAggregate.sortBased.fallbackThreshold", v))
    import spark.implicits._
    val bmPath = graft.ops.Bm25.defaultPath(sfDir)
    graft.ops.Bm25.ensurePostings(Tables.documents(spark, sfDir), bmPath)
    val emb = Tables.embeddings(spark, sfDir)
    val ivfPath = graft.ops.VectorIndex.defaultPath(sfDir)
    graft.ops.VectorIndex.ensureIvf(emb, ivfPath)
    val pool = Vector("window", "merge", "spark", "join", "scan",
      "key", "hash", "filter", "batch", "sort", "group", "column",
      "stream", "vector", "query", "table")
    val qrows = emb.filter(col("vec_id") < 1024)
      .select(col("vec_id"), col("embedding")).collect()
    val queries = qrows.map { r =>
      val i = r.getLong(0)
      (f"q$i%04d", Seq(pool((i % 16).toInt), pool(((i / 16) % 16).toInt),
        pool(((i / 256) % 16).toInt)).distinct, r.getSeq[Float](1))
    }.toSeq.toDF("query_id", "terms", "embedding")
    def timed(tag: String)(body: => Long): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = body
        println(f"CAPEXP $tag%-12s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }
    // ---- lexical decomposition (mirrors Bm25.scoreTopKIndexedBatch)
    val terms = pool
    timed("lex:probe") {
      noop(spark.read.parquet(s"$bmPath/postings")
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          col("bucket"))
        .filter(col("term").isin(terms: _*)))
    }
    timed("lexical") {
      graft.ops.Bm25.scoreTopKIndexedBatch(spark, bmPath,
        queries.select(col("query_id"), col("terms")), 20).count()
    }
    // ---- dense decomposition (mirrors RetrievalPipeline.denseHalf)
    val qvecs = qrows.zipWithIndex.map { case (r, i) =>
      ((1L << 40) + i, r.getSeq[Float](1))
    }.toSeq.toDF("vec_id", "embedding")
    timed("dense:cents") {
      spark.read.parquet(s"$ivfPath/centroids").collect().length.toLong
    }
    timed("dense:scan") {
      noop(spark.read.parquet(s"$ivfPath/cells")
        .select(col("vec_id"), col("embedding"), col("c_norm"),
          col("cell")))
    }
    timed("dense") {
      graft.ops.VectorIndex.queryIvf(spark, ivfPath, qvecs, 20,
        nProbe = 4).count()
    }
    timed("full") {
      graft.pipeline.RetrievalPipeline.hybridTopKBatch(spark, bmPath,
        ivfPath, queries, 10).count()
    }
    spark.stop()
  }
}
