package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** Native codegen forms of the two array folds the b19 showcase uses
  * (see graft.ops.Events.arrayHof): the HOF-lambda equivalents
  * (`aggregate`/`filter` with lambdas) are CodegenFallback expressions, so
  * one of them in a projection kicks the whole stage out of whole-stage
  * codegen (~7× measured on this corpus). These generate tight primitive
  * loops instead; EventsSpec pins bit-equality against the lambda
  * reference forms (graft.functions.Hashing.countPosHof/l1QHof),
  * including null-element, NaN and empty-array cases.
  *
  * Null/NaN semantics: null array → null (UnaryExpression default). Null
  * elements are skipped — for CountPositive that is exactly what
  * `size(filter(a, x > 0))` does (a null comparison is not `true`), and
  * for QuantizedAbsL1 it matches DuckDB's null-ignoring `list_sum` and
  * the null-coalescing lambda fold (the PLAIN `aggregate` lambda instead
  * propagates a null element to a null total — pinned as a documented
  * divergence in EventsSpec). NaN compares via Spark SQL's float ordering
  * (SQLOrderingUtil: NaN is greater than every value, so NaN counts as
  * positive — DuckDB agrees), not Java's `NaN > 0 == false`.
  */
abstract class FloatArrayFold extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<float> argument, got ${other.catalogString}")
    }
}

/** Σ floor(|xᵢ|·1e7) as i64 — the quantized L1 norm (order-independent and
  * engine-exact, same rationale as QuantizedDot's 1e15 dot product; 1e7
  * keeps 64-dim unit-ish vectors far inside i64).
  */
case class QuantizedAbsL1(child: Expression) extends FloatArrayFold {
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_abs_l1"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i))
        acc += math.floor(math.abs(x.getFloat(i).toDouble) * 1e7).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $acc += (long) java.lang.Math.floor(
         |        java.lang.Math.abs((double) $a.getFloat($i)) * 1e7);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizedAbsL1 =
    copy(child = newChild)
}

/** Count of strictly-positive elements, as int (the
  * `size(filter(arr, x => x > 0))` fold without the interpreted lambda).
  */
case class CountPositive(child: Expression) extends FloatArrayFold {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_positive"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0
    var i = 0
    while (i < x.numElements()) {
      // Spark SQL float ordering (NaN > everything), not Java's `> 0f`
      if (!x.isNullAt(i) &&
        org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareFloats(x.getFloat(i), 0f) > 0) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $acc = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) &&
         |      org.apache.spark.sql.catalyst.util.SQLOrderingUtil.compareFloats(
         |        $a.getFloat($i), 0f) > 0) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CountPositive =
    copy(child = newChild)
}
