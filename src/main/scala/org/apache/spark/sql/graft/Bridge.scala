package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Accessor for the `private[sql]` Expression↔Column conversions, placed
  * inside the org.apache.spark.sql namespace — the standard extension-
  * library pattern for exposing custom Catalyst expressions as Columns
  * without going through the function registry. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
