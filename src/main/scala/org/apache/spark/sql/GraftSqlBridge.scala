package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 moved these conversions behind `private[sql]`
  * (classic.ExpressionUtils); a same-package shim is the standard
  * pattern Spark extension libraries use to construct Columns from
  * custom Expressions.
  */
object GraftSqlBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
