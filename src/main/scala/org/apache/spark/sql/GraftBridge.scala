package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ↔ Expression bridge for custom Catalyst expressions. Spark 4's
  * Column API is column-node based (Spark Connect compatible) and no longer
  * exposes `.expr` publicly; the classic conversions live behind
  * `private[sql]`, so this one-file shim in the sql package re-exports them
  * for the engine's expression layer (standard extension-library practice).
  */
object GraftBridge {
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
}
