package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Column <-> Expression bridge. Spark 4 split the Column API from
 * Catalyst (Column wraps a ColumnNode, not an Expression) and the
 * converters live in `private[sql]` scope — this object, compiled into
 * the sql package namespace, re-exports the two conversions a library
 * shipping custom expressions needs. (Standard technique for Spark 4
 * extension libraries.)
 */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
