package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression⇄Column bridge `private[sql]`
  * (`classic.ExpressionUtils`); extension libraries conventionally expose
  * it via a shim inside the `org.apache.spark.sql` namespace. Used only by
  * graft.functions to lift native Catalyst expressions into Columns.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
