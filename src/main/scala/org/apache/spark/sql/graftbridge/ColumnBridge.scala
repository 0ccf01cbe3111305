package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved Column↔Expression conversion behind
  * `private[sql] ExpressionUtils`; custom native expressions (e.g.
  * [[graft.functions.SimHash64]]) still need it. This bridge lives in
  * the `org.apache.spark.sql` namespace purely to re-export those two
  * conversions — nothing else from internals is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
