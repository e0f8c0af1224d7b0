package graft.functions.expr

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the engine's 40-bit portable string hash (see
  * graft.functions.Hashing.md5Long40): little-endian digest bytes 8..12 of
  * md5(s) — the exact value DuckDB computes as
  * `md5_number_lower(s) % 2^40`.
  *
  * Exists for performance on the dedup hot paths (MinHash/SimHash/
  * fingerprints hash every shingle/token): the built-in composition
  * `conv(concat(substring(md5(s),…)×5), 16, 10)` allocates six
  * intermediate UTF8Strings per row and round-trips through hex text;
  * this expression digests the raw bytes and assembles the long directly,
  * inside whole-stage codegen with a cached per-operator MessageDigest.
  * Same preference-order rationale as QuantizedDot: builtins first, a
  * native Expression only once the builtin form is the measured
  * bottleneck.
  */
case class Md5Long40(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_long40"

  // interpreted fallback allocates per call (thread-safe); the codegen
  // path below caches one digest per generated operator (per task)
  override def nullSafeEval(input: Any): Any = {
    val b = MessageDigest.getInstance("MD5")
      .digest(input.asInstanceOf[UTF8String].getBytes)
    Md5Long40.assemble(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "md5long40Digest",
      v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
              |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
              |""".stripMargin)
    nullSafeCodeGen(ctx, ev, s => {
      val b = ctx.freshName("digest")
      s"""
         |byte[] $b = $md.digest($s.getBytes());
         |${ev.value} = graft.functions.expr.Md5Long40.assemble($b);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Long40 =
    copy(child = newChild)
}

object Md5Long40 {
  /** Little-endian assembly of digest bytes 8..12 (public: called from
    * generated code).
    */
  def assemble(digest: Array[Byte]): Long =
    (digest(8).toLong & 0xffL) |
      ((digest(9).toLong & 0xffL) << 8) |
      ((digest(10).toLong & 0xffL) << 16) |
      ((digest(11).toLong & 0xffL) << 24) |
      ((digest(12).toLong & 0xffL) << 32)
}
