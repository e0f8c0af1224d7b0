package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Count of elements of an array<string> column that equal any of a
  * fixed literal string set — the codegen form of
  * `size(filter(arr, w => w === v1 || w === v2 || …))`, which was the
  * last interpreted HOF lambda on a corpus-scale path (x10's stopword
  * counter): lambda HOFs are CodegenFallback, one boxed lambda call per
  * element, and knock the whole projection out of whole-stage codegen.
  * This generates a tight loop over a pre-built UTF8String hash set.
  *
  * Semantics match the filter form exactly (pinned in TextVectorSpec):
  * null array → null, null elements are skipped (a null equality is not
  * `true`, so the filter drops them), comparison is exact binary UTF8
  * equality.
  */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.catalogString}")
    }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0
    var i = 0
    while (i < x.numElements()) {
      if (!x.isNullAt(i) && set.contains(x.getUTF8String(i))) acc += 1
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("inSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $acc = 0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $acc++;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}
