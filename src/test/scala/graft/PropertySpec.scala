package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SecondMax
import graft.functions.expr.Md5Long40
import graft.stream.LineProtocol

/** ScalaCheck properties (SURVEY.md §5.4) for the engine's pure kernels —
  * run through scalacheck's own runner (no scalatest bridge in the
  * offline cache). Spark-evaluated invariants (clamp bounds, window
  * assignment) live in WeatherSpec/StreamingSpec as batched tests.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: $res")
  }

  test("SecondMax: merge is commutative and equals single-pass reduce") {
    val gDoubles = Gen.listOf(Gen.chooseNum(-1e6, 1e6))
    check("merge-commutative", Prop.forAll(gDoubles, gDoubles) { (l, r) =>
      val bl = l.foldLeft(SecondMax.zero)(SecondMax.reduce)
      val br = r.foldLeft(SecondMax.zero)(SecondMax.reduce)
      SecondMax.finish(SecondMax.merge(bl, br)) ==
        SecondMax.finish(SecondMax.merge(br, bl))
    })
    check("merge-equals-reduce", Prop.forAll(gDoubles, gDoubles) { (l, r) =>
      val bl = l.foldLeft(SecondMax.zero)(SecondMax.reduce)
      val br = r.foldLeft(SecondMax.zero)(SecondMax.reduce)
      val merged = SecondMax.finish(SecondMax.merge(bl, br))
      val single = SecondMax.finish((l ++ r).foldLeft(SecondMax.zero)(SecondMax.reduce))
      merged == single
    })
    check("finish-is-second-distinct", Prop.forAll(gDoubles) { xs =>
      val expected = xs.distinct.sorted(Ordering.Double.TotalOrdering.reverse)
        .drop(1).headOption
      SecondMax.finish(xs.foldLeft(SecondMax.zero)(SecondMax.reduce)) == expected
    })
  }

  test("Md5Long40.assemble: always within [0, 2^40), stable across calls") {
    val gBytes = Gen.containerOfN[Array, Byte](16, Gen.chooseNum(-128, 127).map(_.toByte))
    check("range", Prop.forAll(gBytes) { b =>
      val h = Md5Long40.assemble(b)
      h >= 0L && h < (1L << 40) && h == Md5Long40.assemble(b)
    })
  }

  test("LineProtocol: encodes iff a non-null field exists; output is one line") {
    val gStr = Gen.asciiPrintableStr.suchThat(_.nonEmpty)
    val gField = Gen.oneOf[Any](
      Gen.chooseNum(-1e9, 1e9), Gen.chooseNum(-1000L, 1000L),
      Gen.oneOf(true, false), gStr, Gen.const(null))
    val gFields = Gen.nonEmptyListOf(Gen.zip(gStr, gField))
    check("encode", Prop.forAll(gStr, gFields, Gen.posNum[Long]) { (m, fields, ts) =>
      val out = LineProtocol.encode(m, Seq("t" -> "v"), fields, ts)
      val hasField = fields.exists {
        case (_, null) => false
        case (_, d: Double) => !d.isNaN && !d.isInfinite
        case _ => true
      }
      if (!hasField) out.isEmpty
      else out.exists(l => !l.contains("\n") && l.endsWith(s" $ts"))
    })
  }

  test("quantized dot: symmetric and null-free-exact on equal-length arrays") {
    val gVec = Gen.containerOfN[Array, Float](16, Gen.chooseNum(-1f, 1f))
    check("symmetry", Prop.forAll(gVec, gVec) { (a, b) =>
      def dot(x: Array[Float], y: Array[Float]): Long =
        x.zip(y).map { case (p, q) =>
          math.floor(p.toDouble * q.toDouble * 1e15).toLong
        }.sum
      dot(a, b) == dot(b, a)
    })
  }

  test("TopKLongPairs: merge order never changes the result; equals sort-take") {
    // the associativity/commutativity law that licenses the B56/X92/X104
    // partial-aggregate claim (each map task ships <= k pairs): any split
    // of the input into two buffers, merged in either order, must equal
    // the single-pass reduce AND the reference sorted-prefix
    val agg = new graft.functions.TopKLongPairs(3)
    val gPairs = Gen.listOf(Gen.zip(
      Gen.chooseNum(-100L, 100L), Gen.chooseNum(-100L, 100L)))
    def reduceAll(xs: List[(Long, Long)]): Array[Long] =
      xs.foldLeft(agg.zero)(agg.reduce)
    check("merge-commutative-and-correct", Prop.forAll(gPairs, gPairs) { (l, r) =>
      val bl = reduceAll(l)
      val br = reduceAll(r)
      val ab = agg.finish(agg.merge(bl, br))
      val ba = agg.finish(agg.merge(br, bl))
      val ref = (l ++ r).sorted.take(3)
      ab == ba && ab == ref &&
        ab == agg.finish(reduceAll(l ++ r))
    })
  }
}
