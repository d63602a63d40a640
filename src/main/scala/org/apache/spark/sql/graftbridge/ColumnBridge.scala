package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Catalyst Expression bridge. Spark 4 made `Column` backend-
  * agnostic and scoped the classic conversions `private[sql]`; this shim
  * lives in an `org.apache.spark.sql` subpackage purely to re-export them
  * for graft's custom expressions (e.g.
  * [[graft.functions.WinnowedFingerprints]]).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
