package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 hides Column<->Expression conversion behind private[sql]
  * (`org.apache.spark.sql.classic.ExpressionUtils`). This shim re-exports
  * just those two conversions for graft's custom Catalyst expressions —
  * the same approach third-party Spark extension libraries use.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
