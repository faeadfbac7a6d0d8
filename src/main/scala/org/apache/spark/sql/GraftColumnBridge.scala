package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for custom Catalyst expressions.
  *
  * Spark 4 moved `Column.expr`/`new Column(expr)` behind
  * `private[sql] org.apache.spark.sql.classic.ExpressionUtils`; the
  * canonical extension-library pattern is a one-file accessor inside the
  * org.apache.spark.sql package (same technique used by public Spark
  * connector/extension projects). No Spark internals are modified.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
