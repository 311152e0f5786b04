package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: write `.explain("formatted")` for named registered
  * queries to files — the plans/r15/<query>_{before,after}.txt
  * deliverable of the optimization rounds. Each query is EXECUTED
  * first so the dumped plan is the AQE-final physical plan (the shape
  * the bench actually runs), then the formatted explain is written.
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.filter(kv => names(kv._1)).toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          df.collect() // finalize the AQE plan
          val formatted = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(
            Paths.get(s"$outDir/${name}_$suffix.txt"), formatted)
          println(s"PLANDUMP wrote $outDir/${name}_$suffix.txt")
        } catch { case e: Throwable =>
          println(s"PLANDUMP $name FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
