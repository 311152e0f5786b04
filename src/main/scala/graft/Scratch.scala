package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (overwrite freely): dump formatted plans for the
  * newest queries to eyeball exchange counts and pushdown.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    Seq("agg_exact_median", "agg_string_concat", "agg_stats_funcs",
      "replacing_latest", "session_window_native")
      .foreach { q =>
        println(s"===== $q =====")
        println(SparkEntry.queries(q)(spark, d)
          .queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode))
      }
    spark.stop()
  }
}
