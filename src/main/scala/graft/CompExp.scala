package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Components, Similarity}

/** Dev experiment: pointer doubling on/off for the components loop at
  * sf0.1 — near-dup graphs are clique unions, so the jump join may cost
  * more per round than the rounds it saves. Prints timings + round
  * traces; not part of the driver contract.
  */
object CompExp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val pairs = Similarity.nearDupPairsLsh(emb, 0.4)
      .select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .localCheckpoint(true)
    println(s"edges: ${pairs.count()}")
    def run(pd: Boolean): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = Components.connectedComponents(pairs,
        pointerDoubling = pd, verbose = i == 1).count()
      println(f"pd=$pd run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n nodes)")
    }
    run(pd = true)
    run(pd = false)
    spark.stop()
  }
}
