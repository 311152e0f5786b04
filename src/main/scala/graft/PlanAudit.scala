package graft

import org.apache.spark.sql.SparkSession

/** Dev diagnostic: physical-plan shape of every registered query at
  * sf0.001 — exchange count, partial-agg presence, join kinds, and
  * whole-stage-codegen spans (the `*(n)` markers). Complements
  * PlanShapeSpec (which asserts no quadratic joins): this prints the
  * numbers a plan review reads. Optional arg = substring filter;
  * optional second arg `full` additionally prints the final physical
  * plan text (PLANS.md source material).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val filter = args.headOption.getOrElse("")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(filter)).foreach { case (name, fn) =>
        try {
          val df = fn(spark, sf)
          df.collect() // execute THIS frame so AQE finalizes its plan
          val full = df.queryExecution.explainString(
            org.apache.spark.sql.execution.SimpleMode)
          // AQE explain prints Final + Initial plans; audit the final
          val plan = full.split("== Initial Plan ==").head
          println(s"AUDIT $name" +
            s" exchanges=${"Exchange (hash|range|Single)".r.findAllIn(plan).size}" +
            s" partialAgg=${plan.contains("partial_")}" +
            s" bhj=${"BroadcastHashJoin".r.findAllIn(plan).size}" +
            s" smj=${"SortMergeJoin".r.findAllIn(plan).size}" +
            s" bnlj=${"BroadcastNestedLoop".r.findAllIn(plan).size}" +
            s" codegenSpans=${"\\*\\(\\d+\\)".r.findAllIn(plan).toSeq.distinct.size}")
          if (args.lift(1).contains("full")) println(plan)
        } catch { case e: Throwable =>
          println(s"AUDIT $name ERROR ${e.getMessage.take(80)}")
        }
      }
    spark.stop()
  }
}
