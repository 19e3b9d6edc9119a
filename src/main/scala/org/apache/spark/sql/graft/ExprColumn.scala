package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between graft's custom Catalyst `Expression`s and the public
  * `Column` API. Spark 4's column-node refactor made the converters
  * `private[sql]`, so this one-file shim lives in the sql package tree —
  * the standard extension-library move (same trick every Spark connector
  * that ships custom expressions uses).
  */
object ExprColumn {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eagerly-converted expression: runs the ColumnNode converter NOW
    * instead of returning the lazy ColumnNodeExpression wrapper. Needed
    * when the column (e.g. a typed-Aggregator udaf application) is
    * embedded inside a FunctionRegistry builder's expression tree —
    * the analyzer does not descend into wrapper nodes planted there. */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
