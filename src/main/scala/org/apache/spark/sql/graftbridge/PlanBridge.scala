package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into Spark's private[sql] Dataset.ofRows — needed by the
  * scale-shape test gates to evaluate SUBTREES of an analyzed plan
  * (e.g. "how many rows does this broadcast-hinted side actually
  * have"). Lives under org.apache.spark.sql to satisfy the
  * private[sql] qualifier; contains no logic of its own.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
