package graft.scale

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table utilities — the 100 TB answer to repeated fact-fact
  * joins.
  *
  * The engine's only unavoidable shuffle is orders<->lineitem-shaped
  * joins on the natural key (SURVEY.md §2 D). When the same join key is
  * hit repeatedly (daily pipelines over the same warehouse), hash
  * bucketing both tables by that key at write time makes every later
  * join/aggregation on it exchange-free: Spark reads co-located buckets
  * and sort-merge-joins them in place. One shuffle at ingest amortized
  * over every downstream query.
  */
object Bucketing {

  /** Write a table bucketed (and sorted within buckets) by `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two tables bucketed on the same key with the same bucket
    * count — plans as a zero-Exchange sort-merge join. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True iff the physical plan contains no shuffle exchange — the
    * property bucketing buys; exposed for tests/diagnostics. */
  def isExchangeFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan
    !plan.toString.contains("Exchange hashpartitioning")
  }
}
