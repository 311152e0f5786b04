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
    time("warmup")(docs.count())
    time("signatures")(graft.ops.Dedup.minHashSignatures(docs, 3, 32)
      .agg(min("h0")).collect())
    time("minHashDedup")(graft.ops.Dedup.minHashDedup(docs, 3, 0.8).count())
    time("simhash pairs")(graft.ops.Dedup.simHashPairs(docs).count())
    spark.stop()
  }
}
