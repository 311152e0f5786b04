package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column<->Expression conversions —
  * the supported extension-library pattern for exposing custom Catalyst
  * expressions through the public Column API (Spark 4 removed the
  * public `new Column(expr)` constructor in favor of ColumnNodes).
  * Lives under org.apache.spark.sql to satisfy the private[sql]
  * qualifier; contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
