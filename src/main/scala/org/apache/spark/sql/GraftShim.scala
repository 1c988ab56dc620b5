package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's `private[sql]` Column <-> Expression converters.
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; the
  * usual extension-library pattern is a small shim object living in the
  * `org.apache.spark.sql` package. Nothing else in this project touches
  * Spark internals.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
