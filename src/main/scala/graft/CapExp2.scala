package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev experiment (round 16): stage-level decomposition INSIDE the two
  * halves of retrieval_service_cap — mirrors the private dataflow of
  * Bm25.scoreTopKIndexedBatch / VectorIndex.queryIvf so each stage can
  * be timed with a noop sink (guide §1.4).
  */
object CapExp2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SCRATCH_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_PARTS", "32"))
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
    def timed(tag: String)(body: => Long): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = body
        println(f"CAPEXP2 $tag%-16s ${(System.nanoTime() - t0) / 1e9}%.3f s  rows=$n")
      }
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    // ---------- lexical internals (mirrors scoreTopKIndexedBatch)
    val canon: Seq[(String, Seq[String])] = qrows.toSeq.map { r =>
      val i = r.getLong(0)
      (f"q$i%04d", Seq(pool((i % 16).toInt), pool(((i / 16) % 16).toInt),
        pool(((i / 256) % 16).toInt)).distinct.sorted)
    }
    val repOf = canon.groupBy(_._2).map { case (ts, qs) => (ts, qs.map(_._1).min) }
    val repIdx = repOf.toSeq.sortBy(_._2).zipWithIndex
      .map { case ((ts, _), i) => (ts, i) }.toMap
    val pairs = repIdx.toSeq.flatMap { case (ts, rid) => ts.map(t => (rid, t)) }
    val terms = pairs.map(_._2).distinct
    println(s"CAPEXP2 reps=${repIdx.size} pairs=${pairs.size} terms=${terms.size}")
    val qterms = pairs.toDF("query_id", "term")
    val k1 = 1.2; val b = 0.75
    val probe = spark.read.parquet(s"$bmPath/postings")
      .select(col("term"), col("doc_id"), col("tf"), col("dl"))
      .filter(col("term").isin(terms: _*))
    timed("lex:stage") {
      graft.scale.Staging.materialize(probe, "capexp2").count()
    }
    val tf = graft.scale.Staging.materialize(probe, "capexp2-main")
    println(s"CAPEXP2 postings rows=${tf.count()}")
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpusStats = spark.read.parquet(s"$bmPath/stats")
    val idf = df.crossJoin(broadcast(corpusStats))
      .select(col("term"),
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5))
          / (col("df") + lit(0.5))).as("idf"),
        (col("total_dl").cast("double") / col("n_docs")).as("avgdl"))
    val contrib = tf
      .join(broadcast(idf), Seq("term"))
      .select(col("term"), col("doc_id"),
        (col("idf") * (col("tf") * (lit(k1) + 1.0))
          / (col("tf") + lit(k1) * (lit(1.0) - b
            + lit(b) * col("dl") / col("avgdl")))).as("s"))
    val parts = spark.sessionState.conf.numShufflePartitions
    timed("lex:contrib") { noop(contrib) }
    val repart = contrib.repartition(parts, col("doc_id"))
    timed("lex:repart") { noop(repart) }
    val expanded = repart.join(broadcast(qterms), Seq("term"))
    timed("lex:expand") { expanded.count() }
    val scored = expanded
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(col("s")), 4).as("score"))
    timed("lex:agg") { scored.count() }
    val topk = graft.ops.GroupTopN.rankByScore(scored,
      Seq(col("query_id")), col("score"), col("doc_id"), 20,
      decimals = 4, scoreName = "score", idName = "doc_id")
    timed("lex:heap") { topk.count() }
    timed("lex:full") {
      graft.ops.Bm25.scoreTopKIndexedBatch(spark, bmPath,
        canon.toDF("query_id", "terms"), 20).count()
    }

    // ---------- mask-pivot reshape prototype (round 16)
    val termList = terms.sorted
    val slotExprs = termList.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("s"))).as(s"s$i") }
    val docSlots = contrib.repartition(parts, col("doc_id"))
      .groupBy(col("doc_id"))
      .agg(slotExprs.head, slotExprs.tail: _*)
      .select(col("doc_id"), array(termList.indices.map(i =>
        coalesce(col(s"s$i"), lit(0.0))): _*).as("slots"))
    timed("lex2:pivot") { docSlots.count() }
    val repRows = repIdx.toSeq.map { case (ts, rid) =>
      (rid, termList.map(t => if (ts.contains(t)) 1.0 else 0.0)) }
    val reps = repRows.toDF("query_id", "mask")
    val scored2 = docSlots.join(broadcast(reps))
      .select(col("query_id"), col("doc_id"),
        graft.functions.VectorFunctions.vec_dot(col("slots"), col("mask"))
          .as("raw"))
      .filter(col("raw") > 0)
      .select(col("query_id"), col("doc_id"),
        round(col("raw"), 4).as("score"))
    timed("lex2:score") { scored2.count() }
    val topk2 = graft.ops.GroupTopN.rankByScore(scored2,
      Seq(col("query_id")), col("score"), col("doc_id"), 20,
      decimals = 4, scoreName = "score", idName = "doc_id")
    timed("lex2:heap") { topk2.count() }
    // value-equality check vs the current tail
    val cur = topk.select(col("query_id"), col("doc_id"), col("score"),
      col("rank"))
    val neu = topk2.select(col("query_id"), col("doc_id"), col("score"),
      col("rank"))
    val diff = cur.exceptAll(neu).count() + neu.exceptAll(cur).count()
    println(s"CAPEXP2 lex2 diff=$diff")

    // ---------- dense internals (mirrors queryIvf)
    val qvecs = qrows.zipWithIndex.map { case (r, i) =>
      ((1L << 40) + i, r.getSeq[Float](1))
    }.toSeq.toDF("vec_id", "embedding")
    val cents = spark.read.parquet(s"$ivfPath/centroids")
      .select(col("cell"), col("centroid"), col("norm"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(cents.map(_._2))
    val idOf = array(cents.map(c => lit(c._1)).toIndexedSeq: _*)
    val q = qvecs
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_emb"),
        graft.functions.VectorFunctions.vec_norm(col("embedding")).as("q_norm"),
        explode(graft.functions.CentroidFunctions.centroid_top_cells(
          col("embedding"), bc, 4)).as("cidx"))
      .select(col("query_id"), col("q_emb"), col("q_norm"),
        element_at(idOf, col("cidx") + 1).as("cell"))
    val probedCells = q.select(col("cell")).distinct()
      .collect().map(_.getInt(0)).toSeq
    println(s"CAPEXP2 probedCells=${probedCells.size}")
    val base = spark.read.parquet(s"$ivfPath/cells")
      .select(col("vec_id"), col("embedding"), col("c_norm"), col("cell"))
      .filter(col("cell").isin(probedCells: _*))
    println(s"CAPEXP2 cells rows=${base.count()}")
    val ranked = base
      .join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(graft.functions.VectorFunctions.vec_dot(
          col("q_emb"), col("embedding"))
          / (col("q_norm") * col("c_norm")), 4).as("sim"))
    timed("dense:pairs") { ranked.count() }
    timed("dense:pairsnoop") { noop(ranked) }
    val dtopk = graft.ops.GroupTopN.rankByScore(ranked,
      Seq(col("query_id")), col("sim"), col("neighbor_id"), 20,
      decimals = 4, scoreName = "sim", idName = "neighbor_id")
    timed("dense:heap") { dtopk.count() }
    timed("dense:full") {
      graft.ops.VectorIndex.queryIvf(spark, ivfPath, qvecs, 20,
        nProbe = 4).count()
    }
    spark.stop()
  }
}
