package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expr.{Md5Long40, QuantizedDot}

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
      (args: Seq[Expression]) => QuantizedDot(args(0), args(1))))

  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
