package graft.route

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/**
 * Column <-> catalyst Expression bridge for Spark 4.x, where `Column`
 * wraps a ColumnNode rather than an Expression directly.
 */
object GraftColumns {
  def of(e: Expression): Column = GraftBridge.column(e)
  def expr(c: Column): Expression = GraftBridge.expression(c)
}
