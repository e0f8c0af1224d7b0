package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Skip-gram pair generation in one fused pass: token i paired with
  * positions i+1 … i+window, each pair emitted as the single string
  * `"a b"` — canonically ordered (binary UTF8 least/greatest, matching
  * Spark's string comparison) when `canonical`, in stream order
  * otherwise (window=1 + canonical=false ⇒ ordered bigrams).
  *
  * The built-in composition (Hashing.skipGramPairsHof — X44/X49's
  * original form) nests two `transform` lambdas with a `slice` and a
  * `concat`/`least`/`greatest` per pair, all interpreted (HOF lambdas
  * don't codegen) and each step allocating an intermediate array. This
  * expression emits the final pair strings directly; the joiner is a
  * single space, which `\s+`-split tokens cannot contain, so the pair
  * string is a faithful identity for the token pair. Bit-identical to
  * the lambda form (pinned in CooccurSpec across windows 1-3, both
  * orderings, and edge arrays); measured x44 1.43 s → 0.95 s and x49
  * 1.20 s → 0.71 s at sf0.1 (medians of 5, isolated warm sessions).
  */
case class SkipGramPairs(child: Expression, window: Int, canonical: Boolean)
    extends UnaryExpression {

  require(window >= 1, s"window must be >= 1, got $window")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "skip_gram_pairs"

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> argument, got ${other.catalogString}")
    }

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    SkipGramPairs.compute(input.asInstanceOf[ArrayData], window, canonical)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.expr.SkipGramPairs.compute($arr, $window, $canonical);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SkipGramPairs {

  private val Space = UTF8String.fromString(" ")
  private val Empty = UTF8String.fromString("")

  /** Static so generated code calls it directly; the call site stays
    * inside the whole-stage-codegen projection.
    */
  def compute(words: ArrayData, window: Int, canonical: Boolean): ArrayData = {
    val n = words.numElements()
    val out = new java.util.ArrayList[UTF8String](
      math.max(0, n * window - window * (window + 1) / 2))
    def at(i: Int): UTF8String =
      if (words.isNullAt(i)) Empty else words.getUTF8String(i)
    var i = 0
    while (i < n - 1) {
      val a = at(i)
      val hi = math.min(i + window, n - 1)
      var j = i + 1
      while (j <= hi) {
        val b = at(j)
        val (x, y) =
          if (canonical && a.compareTo(b) > 0) (b, a) else (a, b)
        out.add(UTF8String.concat(x, Space, y))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray(
      new Array[UTF8String](out.size())).asInstanceOf[Array[Any]])
  }
}
