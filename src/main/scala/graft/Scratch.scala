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
    val docs = Tables.documents(spark, d)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    // drive the SQL-function registration surface end-to-end
    graft.functions.GraftExtensions.register(spark)
    Tables.embeddings(spark, d).createOrReplaceTempView("embeddings")
    spark.sql("""SELECT vec_id, round(vec_norm(embedding), 3) AS n,
      round(vec_dot(embedding, embedding), 3) AS d2
      FROM embeddings ORDER BY vec_id LIMIT 3""").show()
    // probe: wrong arity should fail with a clear message
    try spark.sql("SELECT vec_dot(embedding) FROM embeddings").collect()
    catch { case e: Exception =>
      println("arity error => " + e.getMessage.linesIterator.next()) }
    spark.stop()
  }
}
