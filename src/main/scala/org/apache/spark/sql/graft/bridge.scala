package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into Spark's `private[sql]` Column ⇄ Expression
  * conversions (Spark 4 wraps Column around ColumnNode; the classic
  * converters live behind the sql package seal). This is the standard
  * extension-library pattern for exposing custom Catalyst expressions as
  * user-facing Columns.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
