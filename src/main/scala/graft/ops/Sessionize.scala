package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: consecutive rows of one key belong to the
  * same session while the time gap stays within `gapSec`; a larger gap
  * starts a new session. The standard building block for user-behavior
  * analytics over an event stream (the reference's event-tracking
  * domain — kafka+clickhouse.md:57-63 — stops at daily rollups; this is
  * the finer-grained operator a warehouse over the same data needs).
  *
  * Mechanics: one `lag` to flag gap breaks, one running `sum` to turn
  * flags into 1-based session ordinals. Both windows share the
  * (key)×(time, tie) sort, so the whole operator is a single shuffle on
  * key + one sort per partition — no self-join, scales linearly in
  * rows per key and parallelizes across keys.
  */
object Sessionize {

  /** Adds `session_seq` (1-based per key) to `df`. `time` must be a
    * TIMESTAMP column; `tie` makes the ordering total when timestamps
    * collide (required for deterministic, oracle-matching output).
    */
  def assign(df: DataFrame, key: Column, time: Column, tie: Column,
      gapSec: Long): DataFrame = {
    val w = Window.partitionBy(key).orderBy(time, tie)
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevUs = lag(unix_micros(time), 1).over(w)
    val isNew = when(prevUs.isNull ||
      unix_micros(time) - prevUs > gapSec * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_seq", sum(isNew).over(run))
  }

  /** Per-session rollup: `key, session_seq, n_events, start_us, end_us,
    * dur_us` (bounds as epoch-microsecond bigints — engine-portable).
    */
  def sessions(df: DataFrame, key: Column, time: Column, tie: Column,
      gapSec: Long): DataFrame =
    assign(df, key, time, tie, gapSec)
      .groupBy(key, col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(time)).as("start_us"),
        max(unix_micros(time)).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
}
