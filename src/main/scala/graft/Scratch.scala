package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (overwrite freely): time suspect queries in
  * isolation at sf0.1, two passes each (first = codegen+JIT warm).
  * Timing action is `.count()` — the SAME action Bench uses, so
  * numbers here are comparable to BENCH_QUERIES.json medians (count()
  * lets Catalyst prune projections a sink would keep, but both
  * harnesses prune identically).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    Seq("dedup_simhash", "setop_except", "setop_intersect",
      "pipeline_pretraining_corpus")
      .foreach { q =>
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(q)(spark, d).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"$q%-32s warm=${times(0)}%.2f steady=${times(1)}%.2f")
      }
    spark.stop()
  }
}
