package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public Column API and catalyst Expressions.
  *
  * Spark 4 made `Column` a ColumnNode wrapper and `ExpressionUtils`
  * `private[sql]`; libraries that add native expressions use a shim in the
  * `org.apache.spark.sql` namespace (the same pattern Delta/Frameless use)
  * to convert at the boundary. This is the only file in the repo outside
  * the `graft` namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
