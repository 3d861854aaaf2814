package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's `private[sql]` Column <-> catalyst Expression
  * converters (Spark 4 moved Column onto ColumnNode, so `new Column(expr)`
  * no longer exists). This file lives under `org.apache.spark.sql` solely
  * to satisfy the access qualifier; it contains no Spark-internal logic.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
