package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 decoupled `Column` from catalyst `Expression`; the conversion
  * lives in `private[sql]` ExpressionUtils. This bridge (placed inside the
  * org.apache.spark.sql package, the standard pattern for Spark-extension
  * libraries) re-exports just the two conversions the graft engine needs to
  * register custom Catalyst expressions as user-facing Columns.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
