package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4's Column is backend-agnostic and no longer exposes `.expr`; the
  * classic-backend converters live in `private[sql]` ExpressionUtils. This
  * shim (in the sql namespace, the standard technique for Spark extension
  * libraries) re-exports just the two conversions custom Expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
