package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and public `Column`s.
  *
  * Spark 4 made `Column` representation-agnostic, so the expression
  * constructor is `private[sql]`; extension libraries reach it from the
  * `org.apache.spark.sql` namespace (same approach as other Catalyst-level
  * Spark extensions). This is the only file outside the `graft` package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
