package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` Expression↔Column conversions —
  * Spark 4's Column wraps a ColumnNode, so a custom Catalyst
  * [[Expression]] (graft.plans.ExtractRecord) needs this one hop to be
  * used from the public DataFrame API. Public Spark API surface is
  * otherwise untouched. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
