package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between public [[Column]]s and Catalyst [[Expression]]s.
  * Spark 4 made the Column↔Expression conversion `private[sql]`
  * (columnNodeSupport.scala), so custom native expressions need this
  * one-file shim inside the org.apache.spark.sql package space. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
