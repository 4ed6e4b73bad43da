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

  /** Register a function on an ALREADY-RUNNING session (extensions only
    * apply at session construction; getOrCreate reuses sessions). */
  def registerFunction(
      s: SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    s.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
