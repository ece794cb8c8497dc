package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for custom Catalyst expressions.
  *
  * Spark 4's `ExpressionUtils` is `private[sql]`, so libraries that
  * ship native expressions expose it from a subpackage of
  * `org.apache.spark.sql` — the standard extension-library pattern
  * (public Spark API surface, no internals copied). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
