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
  * Why this shape at 100 TB: 2 rows per interval, no pairwise
  * interval join anywhere — overlap queries via self-join are
  * quadratic in the dense-overlap regime this operator exists for
  * (everyone online at the same peak minute). The sweep itself is a
  * running sum, and the group key is typically LOW-cardinality (a
  * day, a shard) — so like every prefix sum here
  * ([[Curation.packTokenCounts]]), it runs TWO-PHASE rather than as
  * one `Window.partitionBy(key)` that would funnel a whole day's
  * boundaries through one task:
  *
  *   1. bucket every boundary by `ts >> bucketShift` — monotone in
  *      the sweep order, contiguous time ranges, deterministic (the
  *      default 2^32 us ≈ 71.6 min per bucket);
  *   2. per-(key, bucket) subtotals: the net delta (running-sum
  *      offset) and the bucket's first boundary ts (the cross-bucket
  *      `lead` target);
  *   3. exclusive prefix + next-bucket-min over the BOUNDED subtotal
  *      frame;
  *   4. within-bucket running sums and leads, windowed on
  *      (key, bucket); a bucket's last segment extends to the next
  *      occupied bucket's first boundary. Tie blocks never span a
  *      bucket (equal ts -> equal bucket), so the tie-determinism
  *      argument above carries over unchanged.
  *
  * Empty intervals (start >= end) are dropped: they are empty sets
  * under half-open semantics.
  */
object Intervals {

  /** Per-`keys` peak concurrency (`peak_open`) and union-covered
    * micros (`covered_us`) over [start, end) micro timestamps. */
  def sweep(df: DataFrame, keys: Seq[String], start: Column,
      end: Column, bucketShift: Int = 32): DataFrame = {
    val g = keys.map(col)
    // staged (narrow: keys + ts + delta + bucket): the two-phase sum
    // reads the boundary set twice, and the input is often itself a
    // windowed sessionize output that must not recompute per read
    val bounds = graft.scale.Staging.materialize(
      df.filter(start < end)
        .select(g :+ explode(array(
          struct(start.cast("long").as("ts"), lit(1).as("delta")),
          struct(end.cast("long").as("ts"), lit(-1).as("delta"))))
          .as("b"): _*)
        .select(g :+ col("b.ts").as("ts") :+ col("b.delta").as("delta"): _*)
        .withColumn("sweep_bucket", shiftright(col("ts"), bucketShift)),
      "sweep-bounds")
    val gb = g :+ col("sweep_bucket")
    val subtotals = bounds.groupBy(gb: _*)
      .agg(sum(col("delta")).as("b_delta"), min(col("ts")).as("b_min"))
    val wOff = Window.partitionBy(g: _*).orderBy(col("sweep_bucket"))
    val offsets = subtotals
      .withColumn("open_off", coalesce(
        sum(col("b_delta")).over(
          wOff.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("next_ts", lead(col("b_min"), 1).over(wOff))
      .select(gb :+ col("open_off") :+ col("next_ts"): _*)
    val wIn = Window.partitionBy(gb: _*).orderBy(col("ts"), col("delta"))
    bounds.join(offsets, keys :+ "sweep_bucket")
      .withColumn("open_after", col("open_off") + sum(col("delta"))
        .over(wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("seg_us",
        coalesce(coalesce(lead(col("ts"), 1).over(wIn), col("next_ts"))
          - col("ts"), lit(0L)))
      .groupBy(g: _*)
      .agg(max(col("open_after")).cast("long").as("peak_open"),
        sum(when(col("open_after") > 0, col("seg_us")).otherwise(lit(0L)))
          .cast("long").as("covered_us"))
  }
}
