package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the latest right row of the
  * same key whose time is <= the left row's time (LEFT semantics —
  * unmatched left rows keep a null match). The canonical time-series
  * operator Spark lacks natively.
  *
  * Implementation is the union-merge formulation, not a range join:
  * tag both inputs, union them, sort each key's rows by (time, side,
  * tie) and carry the last non-null right payload forward with
  * `last(..., ignoreNulls)` over a running frame. That is ONE shuffle
  * on the key and one sort — O((n+m) log) per key — where the naive
  * `l.join(r, time-range)` formulation is a BroadcastNestedLoop /
  * O(n·m) pair blowup. At equal timestamps the right row sorts first,
  * so a same-instant match is visible (standard as-of semantics); ties
  * among right rows resolve to the greatest `rightTie`.
  */
object AsOfJoin {

  /** @param key      join key column name, present in both inputs
    * @param leftTime/rightTime  ordering columns (any orderable type,
    *   same type both sides)
    * @param leftTie/rightTie    unique-ish tie-breakers making the
    *   merge order total (determinism)
    * @return left's columns plus `asofCol`: a struct of right's columns
    *   (null when no right row is at-or-before the left row)
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      leftTie: String, rightTie: String,
      asofCol: String = "asof"): DataFrame = {
    val leftRow = struct(left.columns.map(col).toIndexedSeq: _*)
    val rightRow = struct(right.columns.map(col).toIndexedSeq: _*)
    val leftType = left.select(leftRow).schema.head.dataType
    val rightType = right.select(rightRow).schema.head.dataType
    val l = left.select(col(key).as("__key"), col(leftTime).as("__t"),
      col(leftTie).as("__tie"), lit(1).as("__side"),
      leftRow.as("__row"), lit(null).cast(rightType).as("__match"))
    // SQL equi-join semantics: a NULL key never matches anything. The
    // window groups nulls together, so null-keyed RIGHT rows must be
    // dropped here or they would match null-keyed left rows; null-keyed
    // left rows still pass through (unmatched), like a LEFT JOIN.
    val r = right.filter(col(key).isNotNull)
      .select(col(key).as("__key"), col(rightTime).as("__t"),
        col(rightTie).as("__tie"), lit(0).as("__side"),
        lit(null).cast(leftType).as("__row"), rightRow.as("__match"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__filled",
        last(col("__match"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(col("__row.*"), col("__filled").as(asofCol))
  }
}
