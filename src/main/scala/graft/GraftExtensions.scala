package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.expr.{CountInSet, CountPositive, Md5Long40, QuantizedAbsL1, QuantizedDot}

/** SQL registration for the engine's native expressions, so SQL-surface
  * users get them too (`SELECT quantized_dot(a, b)` / `md5_long40(s)`),
  * not only the Column API in graft.functions.Hashing.
  *
  * Two entry points, same registrations:
  *  - cluster/config path: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the standard SparkSessionExtensions hook, applied at session build);
  *  - library path: `GraftFunctions.register(spark)` on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.registrations.foreach(ext.injectFunction)
}

object GraftFunctions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val registrations: Seq[Registration] = Seq(
    (FunctionIdentifier("md5_long40"),
      new ExpressionInfo(classOf[Md5Long40].getName, "md5_long40"),
      (args: Seq[Expression]) => Md5Long40(args.head)),
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))),
    (FunctionIdentifier("quantized_abs_l1"),
      new ExpressionInfo(classOf[QuantizedAbsL1].getName, "quantized_abs_l1"),
      (args: Seq[Expression]) => QuantizedAbsL1(args.head)),
    (FunctionIdentifier("count_positive"),
      new ExpressionInfo(classOf[CountPositive].getName, "count_positive"),
      (args: Seq[Expression]) => CountPositive(args.head)),
    // count_in_set(arr, 'v1', 'v2', …): the set must be literal strings —
    // it is baked into the generated code, not evaluated per row
    (FunctionIdentifier("count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (args: Seq[Expression]) => CountInSet(args.head, args.tail.map {
        case Literal(v: UTF8String, StringType) => v.toString
        case other => throw new IllegalArgumentException(
          s"count_in_set expects literal string set members, got $other")
      })))

  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
