package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval algebra by boundary sweep — the ClickHouse
  * `maxIntersections` / `intervalLengthSum` pair as one grouped pass:
  * per group, the PEAK number of simultaneously open intervals and the
  * total UNION-covered length (overlaps counted once).
  *
  * Sweep: every interval contributes two boundary rows (+1 at start,
  * -1 at end), ordered by (ts, delta) so ends process BEFORE starts at
  * equal timestamps — intervals are half-open [start, end), and
  * touching intervals do not overlap. The running delta sum after each
  * boundary is the open count on [ts, next_ts); peak is its max,
  * covered length the sum of segments where it is positive.
  *
  * Determinism under ties: rows tied on (ts, delta) reach arbitrary
  * relative order, so PER-ROW running values vary — but the outputs
  * don't. A tie block produces the same VALUE MULTISET in any order
  * (all its deltas have the same sign after the (ts, delta) sort, so
  * the partial sums are x±1..x±m regardless of which row goes first),
  * and every interior segment of a tie block is zero-length — only the
  * block-final row, whose running value is order-independent, carries
  * a real segment.
  *
  * Why this shape at 100 TB: 2 rows per interval, ONE shuffle on the
  * group key, then window + aggregate on the same key (the exchange is
  * reused). No pairwise interval join anywhere — overlap queries via
  * self-join are quadratic in the dense-overlap regime this operator
  * exists for (everyone online at the same peak minute).
  *
  * Empty intervals (start >= end) are dropped: they are empty sets
  * under half-open semantics.
  */
object Intervals {

  /** Per-`keys` peak concurrency (`peak_open`) and union-covered
    * micros (`covered_us`) over [start, end) micro timestamps. */
  def sweep(df: DataFrame, keys: Seq[String], start: Column,
      end: Column): DataFrame = {
    val g = keys.map(col)
    val bounds = df.filter(start < end)
      .select(g :+ explode(array(
        struct(start.cast("long").as("ts"), lit(1).as("delta")),
        struct(end.cast("long").as("ts"), lit(-1).as("delta"))))
        .as("b"): _*)
      .select(g :+ col("b.ts").as("ts") :+ col("b.delta").as("delta"): _*)
    val w = Window.partitionBy(g: _*).orderBy(col("ts"), col("delta"))
    bounds
      .withColumn("open_after", sum(col("delta"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seg_us",
        coalesce(lead(col("ts"), 1).over(w) - col("ts"), lit(0L)))
      .groupBy(g: _*)
      .agg(max(col("open_after")).cast("long").as("peak_open"),
        sum(when(col("open_after") > 0, col("seg_us")).otherwise(lit(0L)))
          .cast("long").as("covered_us"))
  }
}
