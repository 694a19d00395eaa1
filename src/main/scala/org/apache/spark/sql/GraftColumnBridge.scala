package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Catalyst Expression conversion for graft's native expressions.
  *
  * Spark 4 hides `classic.ExpressionUtils` behind `private[sql]`; this object
  * lives in package `org.apache.spark.sql` solely to re-expose the two
  * conversions to graft code. It touches no Spark internals beyond the two
  * calls below — the standard extension-library pattern for pre-`Column.apply`
  * Spark 4 codebases.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
