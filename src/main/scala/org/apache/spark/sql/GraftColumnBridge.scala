package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column↔Expression converters — the standard
  * technique for third-party Catalyst extension libraries (Spark 4 made
  * `Column` a thin ColumnNode wrapper; classic conversions are package
  * private). Only the two converters are exposed. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
