package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: points matched to intervals containing them.
  * Spark plans a plain `p >= lo AND p < hi` join as
  * BroadcastNestedLoopJoin — fine for a handful of intervals, O(n·m)
  * once the interval table grows. The bucketed formulation here turns
  * it into an equi-join: every interval explodes to the fixed-width
  * buckets it covers, every point maps to exactly one bucket, the join
  * runs on the bucket id (shuffle hash / sort-merge — partitioned,
  * AQE-skew-splittable), and the exact containment predicate refines
  * the candidates. Cost is O(n + m·w/width + candidates); a point falls
  * in one bucket so no dedup pass is needed.
  */
object RangeJoin {

  /** Join `points` to the `intervals` whose [lo, hi) range contains the
    * point. Intervals may overlap (a point then matches several).
    * `bucketWidth` trades interval fan-out (≈ width/bucketWidth rows
    * per interval) against candidate precision; the median interval
    * width is a good default. Caller guarantees disjoint column names.
    */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val iv = intervals.withColumn("__bucket",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    val pt = points.withColumn("__bucket",
      floor(col(pointCol) / w).cast("long"))
    pt.join(iv, "__bucket")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bucket")
  }
}
