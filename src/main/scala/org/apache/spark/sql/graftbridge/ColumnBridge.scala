package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for catalyst expressions that cannot be
  * built through the function registry because they carry a non-literal
  * runtime handle (a [[org.apache.spark.broadcast.Broadcast]] sketch — see
  * [[graft.plans.CmsProbe]] / [[graft.plans.BloomProbe]]). Spark 4 removed
  * the public `Column(expr)` constructor; the supported conversion lives in
  * `classic.ExpressionUtils`, which is `private[sql]` — hence this one-file
  * subpackage of `org.apache.spark.sql` (the standard library-author shim;
  * no Spark internals are modified or shadowed).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
