package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column <-> Expression conversion for
  * graft's native expressions that carry non-literal state (the BPE
  * merge table), which cannot ride the FunctionRegistry string path
  * the other graft expressions use. Same pattern as GraftTreeAccess
  * for the ml.tree internals. */
object GraftColumnAccess {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
