package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst-Expression bridge.
  *
  * Spark 4 moved these conversions to `org.apache.spark.sql.classic
  * .ExpressionUtils`, which is `private[sql]`; a one-object subpackage of
  * `org.apache.spark.sql` is the conventional way third-party engines reach
  * them (same pattern as every Spark connector that ships custom
  * expressions). Everything else in this repo stays in the `graft`
  * namespace.
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
