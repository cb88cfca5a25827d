package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark 4's package-private Column ↔ Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`). Spark 4 moved Column
  * onto the ColumnNode API, so custom Catalyst expressions can no longer be
  * wrapped with a public constructor; this shim re-exports the two
  * converters the library needs to expose its native expressions
  * (graft.functions.VectorExpressions) as Columns.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
