package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to `private[sql]` surface: Column <-> catalyst Expression.
  * Spark 4 unified Column around ColumnNode and made the converters
  * package-private; third-party native expressions reach them through a shim
  * in the sql namespace — the same pattern other Spark-native libraries use.
  * Keep this file to EXACTLY these two forwarders.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
