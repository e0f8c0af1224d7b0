package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression for the X182 staleness audit's per-vector
  * encode statistics: given a float vector, the frozen coarse centroids
  * (one broadcast row: array<struct<cell, c>> sorted by cell) and the
  * frozen residual codebooks (array<struct<sub, code, qc>> sorted by
  * (sub, code)), emit struct(cell, adc_err, coarse_d2) — the assigned
  * coarse cell (argmin of the exact quantized-dot distance, ties to the
  * smaller cell), the i64 ADC error (Σ over subspaces of the minimum
  * codebook distance on the shared floor(v·scale) grid) and the i64
  * coarse residual energy Σ qd².
  *
  * Exists for performance on the audit hot path (round-18
  * optimization): the equivalent transform/filter/zip_with/aggregate
  * HOF pipeline interprets ~|cells|·dims + m·k·sub lambda frames with
  * per-element boxing for EVERY audited vector, twice per audit run
  * (training + arrivals) — the PqEncode precedent applied to the audit
  * step. IndexStalenessSpec pins this expression bit-equal to the HOF
  * reference form on the full corpus.
  *
  * Exactness contract (must match the HOF form bit-for-bit):
  *  - every dot product is the quantized Σ floor(x·y·1e15) i64 sum
  *    (graft.functions.Hashing.dotQ's kernel);
  *  - the coarse distance is evaluated in double EXACTLY as the column
  *    form `(nq − 2.0·dvc) + dcc` — left-to-right, each i64 operand
  *    converted to double first;
  *  - argmin ties break to the smaller cell (array_min's struct order);
  *  - the residual grid is floor(v·scale) − floor(c·scale) per dim;
  *  - a subspace with NO codebook entry yields a null adc_err (the
  *    reference form's array_min-of-empty → null sum), never 0.
  *
  * Null semantics: any null input array → null row (TernaryExpression
  * default); elements are contract-non-null (artifact rows).
  */
case class IvfPqAudit(vec: Expression, cents: Expression, cbs: Expression,
    m: Int, sub: Int, scale: Double)
    extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = cbs

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cents.dataType, cbs.dataType) match {
      case (ArrayType(FloatType, _),
          ArrayType(StructType(cf), _), ArrayType(StructType(bf), _))
        if cf.map(_.name).sameElements(Array("cell", "c")) &&
          bf.map(_.name).sameElements(Array("sub", "code", "qc")) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, array<struct<cell,c>>, " +
          s"array<struct<sub,code,qc>>), got ${vec.dataType.catalogString}, " +
          s"${cents.dataType.catalogString}, ${cbs.dataType.catalogString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("cell", LongType, nullable = false),
    StructField("adc_err", LongType, nullable = true),
    StructField("coarse_d2", LongType, nullable = false)))
  override def prettyName: String = "ivfpq_audit"

  override def nullSafeEval(v: Any, cs: Any, bs: Any): Any =
    IvfPqAudit.audit(v.asInstanceOf[ArrayData], cs.asInstanceOf[ArrayData],
      bs.asInstanceOf[ArrayData], m, sub, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cs, bs) => {
      s"${ev.value} = graft.functions.expr.IvfPqAudit.audit(" +
        s"$v, $cs, $bs, $m, $sub, $scale);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): IvfPqAudit =
    copy(vec = newFirst, cents = newSecond, cbs = newThird)
}

object IvfPqAudit {
  /** Quantized dot Σ floor(a·b·1e15) over float arrays (the dotQ
    * kernel; lengths truncate to the shorter — fixed-width here). */
  private def dotQ(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.floor(
        a.getFloat(i).toDouble * b.getFloat(i).toDouble * 1e15).toLong
      i += 1
    }
    acc
  }

  /** Public: called from generated code. */
  def audit(v: ArrayData, cents: ArrayData, cbs: ArrayData,
      m: Int, sub: Int, scale: Double): InternalRow = {
    val nq = dotQ(v, v).toDouble
    // coarse argmin: (nq - 2.0*dvc) + dcc, ties to the smaller cell
    var bestDist = Double.PositiveInfinity
    var bestCell = Long.MaxValue
    var bestC: ArrayData = null
    var e = 0
    val nc = cents.numElements()
    while (e < nc) {
      val row = cents.getStruct(e, 2)
      val cell = row.getLong(0)
      val c = row.getArray(1)
      val dvc = dotQ(v, c).toDouble
      val dcc = dotQ(c, c).toDouble
      val dist = (nq - 2.0 * dvc) + dcc
      if (dist < bestDist || (dist == bestDist && cell < bestCell)) {
        bestDist = dist
        bestCell = cell
        bestC = c
      }
      e += 1
    }
    // residual on the shared floor(v·scale) grid + its energy
    val dims = v.numElements()
    val qd = new Array[Long](dims)
    var coarseD2 = 0L
    var i = 0
    while (i < dims) {
      val d = math.floor(v.getFloat(i).toDouble * scale).toLong -
        math.floor(bestC.getFloat(i).toDouble * scale).toLong
      qd(i) = d
      coarseD2 += d * d
      i += 1
    }
    // ADC: per subspace, the minimum codebook distance on qd's slice;
    // a subspace with no surviving entry nulls the whole sum (the
    // reference form's array_min-of-empty semantics)
    val best = Array.fill[Long](m)(Long.MaxValue)
    val seen = new Array[Boolean](m)
    val nb = cbs.numElements()
    var b = 0
    while (b < nb) {
      val row = cbs.getStruct(b, 3)
      val s = row.getLong(0).toInt
      val qc = row.getArray(2)
      if (s >= 0 && s < m) {
        var acc = 0L
        var d = 0
        val base = s * sub
        while (d < sub) {
          val diff = qd(base + d) - qc.getLong(d)
          acc += diff * diff
          d += 1
        }
        if (acc < best(s)) best(s) = acc
        seen(s) = true
      }
      b += 1
    }
    var adc = 0L
    var adcNull = false
    var j = 0
    while (j < m) {
      if (!seen(j)) adcNull = true else adc += best(j)
      j += 1
    }
    val out = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
    out.setLong(0, bestCell)
    if (adcNull) out.setNullAt(1) else out.setLong(1, adc)
    out.setLong(2, coarseD2)
    out
  }
}
