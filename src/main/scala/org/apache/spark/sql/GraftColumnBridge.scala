package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst
  * expressions. `classic.ExpressionUtils` is `private[sql]`, so this
  * one-file shim lives in the spark.sql package — the standard pattern
  * for libraries that ship native expressions (no Spark internals are
  * modified).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
