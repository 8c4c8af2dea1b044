package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into the `private[sql]` Column ↔ Expression converters —
  * the standard pattern for libraries shipping native Catalyst expressions
  * (Spark 4 removed the public `Column(Expression)` constructor in the
  * Connect refactor; classic sessions still convert via ExpressionUtils).
  * Nothing else from the private surface is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
