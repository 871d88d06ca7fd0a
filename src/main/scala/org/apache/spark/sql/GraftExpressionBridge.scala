package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the package-private Expression<->Column converters (Spark 4
  * moved Column construction behind `classic.ExpressionUtils`, which is
  * private[sql]). Standard extension-library escape hatch: this is the only
  * file in the Spark namespace, and it only forwards two calls.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
