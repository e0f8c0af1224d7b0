package graft.functions.expr

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC (canonical composition) normalization of a string column.
  *
  * A corpus-cleaning step every text pipeline needs before hashing or
  * dedup — the SAME text arrives both precomposed ("é" U+00E9) and
  * decomposed ("e" + U+0301) depending on the source, and every
  * downstream exact/MinHash/SimHash dedup key treats those as different
  * documents unless the bytes are canonicalized first. Spark has NO
  * built-in Unicode normalization function (DuckDB ships
  * `nfc_normalize`; the oracle uses it), so per the engine's preference
  * order — builtin > native Expression > UDF — this is the rare case
  * where a native codegen Expression is the FIRST available rung, not a
  * measured optimization of one.
  *
  * The fast path costs nothing on the common case: `Normalizer.isNormalized`
  * scans without allocating, and real-world corpora are overwhelmingly
  * already-NFC ASCII, so the expensive `normalize` copy runs only on rows
  * that actually contain decomposed sequences. Stays inside whole-stage
  * codegen (`doGenCode` below), preserving pipeline fusion on the scan.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.expr.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** NFC-normalize (public: called from generated code). Returns the
    * input object unchanged when already normalized — the dominant case —
    * so the hot path is a single non-allocating scan.
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
