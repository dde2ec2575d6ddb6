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

  /** Whether the session's CacheManager holds any cached plan — the
    * session-hygiene probe CacheHygieneSpec gates on (persisted frames
    * must be released by TransientCache once their query's action
    * completes). */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty
}
