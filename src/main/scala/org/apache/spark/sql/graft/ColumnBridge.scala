package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to Spark's private[sql] Column↔Expression converters —
  * the supported way (short of registering a FunctionBuilder per session)
  * to expose a custom Catalyst expression like
  * [[graft.functions.expr.QuantizedDot]] through the public Column API.
  * Lives under org.apache.spark.sql.* solely for the access qualifier;
  * contains no logic.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
