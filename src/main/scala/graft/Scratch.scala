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
    val names = Seq("events_point_lookup", "q1_pricing_summary",
      "q5_regional_revenue", "mv_level_totals", "dedup_ngram_jaccard",
      "sim_cosine_topk")
    val sb = new StringBuilder
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, d)
      sb.append(s"===== $n\n")
      sb.append(df.queryExecution.executedPlan.treeString.take(3500))
      sb.append("\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans.txt"), sb.toString)
    println("plans written")
    spark.stop()
  }
}
