package graft

import org.apache.spark.sql.SparkSession

/** Dev experiment: capstone wall-clock under the two sharing modes for
  * the gram table (eager localCheckpoint vs lazy persist). */
object CapExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries("pipeline_pretraining_corpus")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, "/root/testdata/sf0.1").count()
      println(f"capstone run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
