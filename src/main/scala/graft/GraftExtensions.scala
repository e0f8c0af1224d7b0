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

  // Analysis-style arity check (the error a user sees for
  // `SELECT md5_long40()` in SQL) — same error condition Spark's own
  // builders raise, so tooling that matches on errorClass/sqlState works.
  private def requireArgs(
      name: String, args: Seq[Expression], exact: Int = -1, atLeast: Int = -1): Unit = {
    val ok = (exact < 0 || args.length == exact) &&
      (atLeast < 0 || args.length >= atLeast)
    if (!ok) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> s"`$name`",
        "expectedNum" -> (if (exact >= 0) exact.toString else s">= $atLeast"),
        "actualNum" -> args.length.toString,
        "docroot" -> "https://spark.apache.org/docs/latest"),
      cause = None)
  }

  val registrations: Seq[Registration] = Seq(
    (FunctionIdentifier("md5_long40"),
      new ExpressionInfo(classOf[Md5Long40].getName, "md5_long40"),
      (args: Seq[Expression]) => {
        requireArgs("md5_long40", args, exact = 1); Md5Long40(args.head)
      }),
    (FunctionIdentifier("quantized_dot"),
      new ExpressionInfo(classOf[QuantizedDot].getName, "quantized_dot"),
      (args: Seq[Expression]) => {
        requireArgs("quantized_dot", args, exact = 2)
        QuantizedDot(args(0), args(1))
      }),
    (FunctionIdentifier("quantized_abs_l1"),
      new ExpressionInfo(classOf[QuantizedAbsL1].getName, "quantized_abs_l1"),
      (args: Seq[Expression]) => {
        requireArgs("quantized_abs_l1", args, exact = 1)
        QuantizedAbsL1(args.head)
      }),
    (FunctionIdentifier("count_positive"),
      new ExpressionInfo(classOf[CountPositive].getName, "count_positive"),
      (args: Seq[Expression]) => {
        requireArgs("count_positive", args, exact = 1)
        CountPositive(args.head)
      }),
    // minhash_sig(arr<bigint>): the engine's standard 16-hash MinHash
    // signature (the X2/X23 coefficient set baked in)
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[graft.functions.expr.MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        requireArgs("minhash_sig", args, exact = 1)
        graft.functions.expr.MinHashSig(args.head,
          graft.ops.Dedup.A.toSeq, graft.ops.Dedup.B.toSeq, graft.ops.Dedup.P)
      }),
    // count_in_set(arr, 'v1', 'v2', …): the set must be literal strings —
    // it is baked into the generated code, not evaluated per row
    (FunctionIdentifier("count_in_set"),
      new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
      (args: Seq[Expression]) => {
        requireArgs("count_in_set", args, atLeast = 1)
        CountInSet(args.head, args.tail.zipWithIndex.map {
          case (Literal(v: UTF8String, StringType), _) => v.toString
          case (_, i) => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`count_in_set`",
              "paramName" -> s"`set_member_${i + 1}`",
              "paramType" -> "\"STRING\""),
            cause = None)
        })
      }),
    // repetition_counts(arr<string>): the six X27 intra-doc repetition
    // counts in one pass
    (FunctionIdentifier("repetition_counts"),
      new ExpressionInfo(
        classOf[graft.functions.expr.RepetitionCounts].getName, "repetition_counts"),
      (args: Seq[Expression]) => {
        requireArgs("repetition_counts", args, exact = 1)
        graft.functions.expr.RepetitionCounts(args.head)
      }),
    // Spark's own runtime-filter pair (catalyst-internal, not
    // SQL-registered upstream) surfaced for B55's explicit
    // bloom-pruned semi-join: bloom_filter_agg(xxhash64(k), items,
    // bits) builds the bits, might_contain(bloom, xxhash64(k)) probes
    // them (the bloom argument must be a scalar subquery or constant —
    // Spark's analyzer enforces it)
    (FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (args: Seq[Expression]) => {
        requireArgs("bloom_filter_agg", args, exact = 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2))
      }),
    (FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (args: Seq[Expression]) => {
        requireArgs("might_contain", args, exact = 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1))
      }))

  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
