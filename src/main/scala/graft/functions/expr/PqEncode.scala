package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the per-subspace PQ E-step: given a
  * quantized residual vector `qd` (m·sub i64 dims), the surviving
  * codebook entry keys (`keys(e) = sub·k + code`, sorted ascending) and
  * their flattened quantized dims (`qcs`, sub longs per entry, same
  * order), emit the m-long code array where code(s) minimizes
  * Σ_d (qd[s·sub+d] − qc[e·sub+d])² over that subspace's entries —
  * ties on the smaller code, which the sorted key order gives for free
  * (strict `<` keeps the first minimum).
  *
  * Exists for performance on the X180 ingest hot path: the equivalent
  * transform/filter/aggregate HOF pipeline interprets ~m·k lambda
  * frames with per-element boxing for EVERY arriving vector (~11k
  * vecs/s measured at 64 dims). This expression runs the whole
  * m·k·sub ≈ 1024-multiply scan as one primitive loop inside
  * whole-stage codegen (matching interpreted nullSafeEval for
  * completeness) — the QuantizedDot precedent applied to the encode
  * step. Survivor-set safe by construction: a code that lost every
  * member simply has no key entry and is never considered (the same
  * property the x173 lut MAP encodes).
  *
  * Null semantics: any null input array → null (TernaryExpression
  * default); elements are never null in the encode path (they come
  * from floor() over non-null floats) — a defensive isNullAt skip
  * would cost the inner loop its tightness for a case the schema
  * excludes, so inputs are contract-non-null per element.
  */
case class PqEncode(qd: Expression, keys: Expression, qcs: Expression,
    m: Int, sub: Int, k: Int)
    extends TernaryExpression {

  override def first: Expression = qd
  override def second: Expression = keys
  override def third: Expression = qcs

  override def checkInputDataTypes(): TypeCheckResult =
    (qd.dataType, keys.dataType, qcs.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _),
          ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires three array<bigint> arguments, got " +
          s"${qd.dataType.catalogString}, ${keys.dataType.catalogString}" +
          s" and ${qcs.dataType.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(q: Any, ks: Any, cs: Any): Any = {
    val qdA = q.asInstanceOf[ArrayData]
    val keyA = ks.asInstanceOf[ArrayData]
    val qcA = cs.asInstanceOf[ArrayData]
    val codes = Array.fill[Long](m)(-1L)
    val best = Array.fill[Long](m)(Long.MaxValue)
    val e = keyA.numElements()
    var i = 0
    while (i < e) {
      val key = keyA.getLong(i)
      val s = (key / k).toInt
      var d = 0
      var acc = 0L
      while (d < sub) {
        val t = qdA.getLong(s * sub + d) - qcA.getLong(i * sub + d)
        acc += t * t
        d += 1
      }
      if (acc < best(s)) { best(s) = acc; codes(s) = key % k }
      i += 1
    }
    // boundary guard (round-15 advice): a subspace with zero surviving
    // key entries would emit -1, which downstream element_at(lut, ...)
    // resolves to a null (or a wrong neighboring-subspace entry)
    // SILENTLY. The M-step always emits ≥1 code per subspace, so this
    // is unreachable today — fail loud, not wrong, if a caller ever
    // hands a codebook that violates the non-empty-per-subspace
    // contract. Cost: m comparisons per row.
    var s2 = 0
    while (s2 < m) {
      if (codes(s2) < 0L) throw new IllegalStateException(
        s"pq_encode: no codebook entry for subspace $s2 — every " +
          "subspace must keep at least one surviving code")
      s2 += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, ks, cs) => {
      val codes = ctx.freshName("codes")
      val best = ctx.freshName("best")
      val e = ctx.freshName("e")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |long[] $codes = new long[$m];
         |long[] $best = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  $codes[$i] = -1L; $best[$i] = Long.MAX_VALUE;
         |}
         |int $e = $ks.numElements();
         |for (int $i = 0; $i < $e; $i++) {
         |  long $key = $ks.getLong($i);
         |  int $s = (int) ($key / $k);
         |  long $acc = 0L;
         |  for (int $d = 0; $d < $sub; $d++) {
         |    long $t = $q.getLong($s * $sub + $d) - $cs.getLong($i * $sub + $d);
         |    $acc += $t * $t;
         |  }
         |  if ($acc < $best[$s]) { $best[$s] = $acc; $codes[$s] = $key % $k; }
         |}
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($codes[$i] < 0L) throw new IllegalStateException(
         |    "pq_encode: no codebook entry for subspace " + $i +
         |    " — every subspace must keep at least one surviving code");
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncode =
    copy(qd = newFirst, keys = newSecond, qcs = newThird)
}
