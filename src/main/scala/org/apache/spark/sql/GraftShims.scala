package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim for `private[sql]` Column↔Expression converters — the
  * supported way for third-party libraries to wrap custom Catalyst
  * expressions as Columns in Spark 4's classic runtime.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
