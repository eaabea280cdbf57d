package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API: `ExpressionUtils` is private[sql] in Spark 4, so extension
  * libraries expose it through a same-package shim (the conventional
  * pattern for third-party Catalyst expressions).
  */
object GraftColumnShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
