package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ catalyst Expression bridge.
  *
  * Spark 4 split `Column` into the connect-agnostic sql-api (backed by
  * `ColumnNode`), making the direct `new Column(expr)` / `col.expr` used
  * by custom-expression libraries `private[sql]`. This is the standard
  * extension-library workaround: a tiny shim inside an
  * `org.apache.spark.sql` subpackage exposing the two conversions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
