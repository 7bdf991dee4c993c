package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column ⇄ Expression converters, for
  * wiring graft's custom Catalyst expressions into the public Column
  * API. (The heavyweight alternative is a FunctionRegistry injection via
  * `SparkSessionExtensions`; a library exposing typed Column functions
  * doesn't need a SQL-name registration.) */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
