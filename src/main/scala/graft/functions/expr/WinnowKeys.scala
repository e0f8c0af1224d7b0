package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for X125's winnowing fingerprint
  * selection: given the whitespace-collapsed lowercase text, emit the
  * DISTINCT selected fingerprint hashes (ascending) — the document's
  * post-window-min h set, exactly the per-doc slice of the column
  * form's `distinct(doc_id, h)` over
  * `min(h·2^posBits + (2^posBits−1−p)) OVER (PARTITION BY doc_id
  * ORDER BY p ROWS BETWEEN w−1 PRECEDING AND CURRENT ROW)` at full
  * windows (p ≥ w).
  *
  * Exists for performance on the fingerprint hot path (round-19
  * optimization, the IvfPqAudit/Md5Long40 precedent): the column form
  * explodes one row per character position (~290 rows/doc at bench
  * corpus), shuffles them into a doc-partitioned sort for the window
  * min, and distinct-s the survivors — two exchanges and a sort whose
  * only purpose is a 4-element trailing minimum that this kernel
  * computes in a register ring. One fused primitive loop per document:
  * per-position md5 (the engine-portable md5Long40 contract, digest
  * reused across positions), packed-key ring minimum, sort + dedup of
  * the selected hashes. WinnowingSpec pins the kernel bit-equal to the
  * column form on the full corpus.
  *
  * Exactness contract (must match the column form bit-for-bit):
  *  - positions are 1-based CHARACTER positions over the collapsed
  *    text (substr semantics); k-gram p covers chars [p, p+k−1];
  *  - h = md5Long40(gram) = little-endian md5 digest bytes 8..12;
  *  - packed key = h·2^posBits + (2^posBits−1−p), so min(key) is
  *    "smallest hash, rightmost position";
  *  - positions cap at 2^posBits−1 (longer docs truncate), docs
  *    shorter than k chars emit an EMPTY array (the column form's
  *    length filter), and only full windows (p ≥ w) select;
  *  - the emitted set is the distinct decoded h = key div 2^posBits,
  *    ascending (callers only consume it as a set).
  *
  * Null semantics: null text → null array (UnaryExpression default;
  * the column form's length(null) ≥ k filter likewise drops the row).
  */
case class WinnowKeys(child: Expression, k: Int, w: Int, posBits: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_keys"

  // interpreted fallback allocates the digest per call (thread-safe);
  // the codegen path caches one per generated operator (per task) —
  // the Md5Long40 discipline
  override def nullSafeEval(input: Any): Any =
    WinnowKeys.select(input.asInstanceOf[UTF8String],
      MessageDigest.getInstance("MD5"), k, w, posBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "winnowDigest",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      s"${ev.value} = graft.functions.expr.WinnowKeys.select(" +
        s"$s, $md, $k, $w, $posBits);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowKeys =
    copy(child = newChild)
}

object WinnowKeys {

  /** Public: called from generated code. One pass over the text bytes;
    * the caller-supplied digest is reused across positions (MessageDigest
    * resets itself on `digest()`).
    */
  def select(t: UTF8String, md: MessageDigest,
      k: Int, w: Int, posBits: Int): ArrayData = {
    val nChars = t.numChars()
    if (nChars < k) return UnsafeArrayData.fromPrimitiveArray(new Array[Long](0))
    val posCap = (1 << posBits) - 1
    val pMax = math.min(nChars - k + 1, posCap)
    // character-start byte offsets (UTF-8 aware, one pass)
    val bytes = t.getBytes
    val offs = new Array[Int](nChars + 1)
    var bi = 0
    var ci = 0
    while (bi < bytes.length) {
      offs(ci) = bi
      bi += UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offs(nChars) = bytes.length
    // trailing window-min ring over packed keys; selected h per full window
    val ring = new Array[Long](w)
    val out = new Array[Long](math.max(pMax - w + 1, 0))
    var nOut = 0
    var lastMk = -1L // packed keys are nonnegative; -1 = none yet
    var p = 1
    while (p <= pMax) {
      md.update(bytes, offs(p - 1), offs(p - 1 + k) - offs(p - 1))
      val h = Md5Long40.assemble(md.digest())
      ring((p - 1) % w) = (h << posBits) + (posCap - p).toLong
      if (p >= w) {
        var mk = ring(0)
        var i = 1
        while (i < w) { if (ring(i) < mk) mk = ring(i); i += 1 }
        // adjacent windows usually share a minimum — cheap pre-dedup
        // before the sort (set-identical: sort+dedup below is global)
        if (mk != lastMk) { out(nOut) = mk >>> posBits; nOut += 1 }
        lastMk = mk
      }
      p += 1
    }
    java.util.Arrays.sort(out, 0, nOut)
    var nDist = 0
    var j = 0
    while (j < nOut) {
      if (j == 0 || out(j) != out(j - 1)) { out(nDist) = out(j); nDist += 1 }
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, nDist))
  }
}
