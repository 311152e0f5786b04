package graft

import org.apache.spark.sql.SparkSession

/** Dev scratchpad (overwrite freely — see NOTES.md): times the named
  * registered queries at a given sf dir with the SAME protocol as
  * Bench (warmup pass at sf0.001, then `count()` timed passes), so
  * numbers here are comparable to BENCH artifacts.
  * Usage: runMain graft.Scratch <sfDir> <query1,query2,...> [passes]
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(",").toSet)
      .getOrElse(Set("pipeline_pretraining_corpus"))
    val passes = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master(sys.env.getOrElse("SCRATCH_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SCRATCH_PARTS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val qs = SparkEntry.queries.filter(kv => names(kv._1))
    qs.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }
    qs.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val samples = (0 until passes).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"SCRATCH $name median=${samples(passes / 2)}%.3f " +
        f"min=${samples.head}%.3f max=${samples.last}%.3f")
    }
    spark.stop()
  }
}
