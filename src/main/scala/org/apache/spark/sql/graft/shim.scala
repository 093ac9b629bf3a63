package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Column and catalyst Expression.
  *
  * In Spark 4 the Column ↔ Expression converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is
  * `private[sql]`; extension libraries conventionally reach it via a
  * shim in the `org.apache.spark.sql` package (same pattern as other
  * open-source Spark extensions).
  */
object shim {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
