package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Narrow bridge into the `private[sql]` Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`, Spark 4.x). Lives in
  * an `org.apache.spark.sql` subpackage solely for access; nothing else
  * belongs here. Used to hand a custom Catalyst expression that captures
  * a Broadcast handle (e.g. [[graft.functions.BloomMightContainBc]])
  * straight to the DataFrame API without a session-function registration
  * that would pin the broadcast in the registry forever.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
