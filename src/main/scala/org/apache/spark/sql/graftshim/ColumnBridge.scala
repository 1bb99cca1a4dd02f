package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's package-private Expression<->Column conversions
  * (org.apache.spark.sql.classic.ExpressionUtils is private[sql] at the
  * Scala level; its bytecode is public). Lives under org.apache.spark.sql
  * solely to satisfy the access qualifier — the standard pattern for
  * libraries that ship custom Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
