package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column <-> Expression converters
  * (Spark 4 removed the public Column(expr) constructor in favor of the
  * Connect-compatible ColumnNode API; classic mode still needs Expression
  * access for custom Catalyst expressions).
  */
object SqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
