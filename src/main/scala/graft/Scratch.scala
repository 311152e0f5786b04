package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val docsX = Tables.documents(spark, d)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val q = emb.filter(col("vec_id") < 3)
    val r0 = graft.ops.Similarity.ivfTopK(q, emb, 10)
    val r2 = graft.ops.Similarity.ivfTopK(q, emb, 10, refineIters = 2)
    val bf = graft.ops.Similarity.bruteForceTopK(q, emb, 10)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = pairs(bf)
    println(s"ivf recall unrefined=${(pairs(r0) & b).size}/${b.size}" +
      s" refined=${(pairs(r2) & b).size}/${b.size}")
    spark.stop()
  }
}
