package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Expression ↔ Column bridge. In Spark 4 `Column` wraps a `ColumnNode` and
  * its Expression constructor is `private[sql]`; this shim lives in Spark's
  * namespace purely for access (same pattern as `PjSparkShims`). All graft
  * logic stays under `graft.*`.
  */
object GraftFunctionBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
