package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for custom Catalyst expressions: Spark 4 made Column↔Expression
  * conversion `private[sql]`, so extensions host this two-liner inside the
  * sql package — the standard pattern for third-party expression libraries. */
object ColumnShim {
  def column(e: Expression): Column   = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
