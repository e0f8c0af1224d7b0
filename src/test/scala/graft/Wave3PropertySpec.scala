package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.StreamTopK

/** ScalaCheck properties for the third/fourth-wave pure kernels — the
  * algebraic laws the ops' exactness claims rest on, generalized past
  * the specs' hand cases. Spark-evaluated forms are pinned equal to
  * these replays in their own suites; here the MATH is the subject.
  */
class Wave3PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---- X119 space-saving ------------------------------------------------

  private val gStream: Gen[List[Long]] =
    Gen.listOf(Gen.frequency(
      3 -> Gen.chooseNum(0L, 3L),      // hot head
      1 -> Gen.chooseNum(0L, 1000L)))  // cold tail

  test("X119: space-saving invariants hold on arbitrary streams") {
    check("mass+sandwich+hitters", Prop.forAll(gStream) { items =>
      val s = StreamTopK.fold(Map.empty, items, k = 4)
      val truth = items.groupBy(identity).view.mapValues(_.length.toLong)
      val mass = s.values.map(_._1).sum == items.length.toLong
      val sandwich = s.forall { case (key, (cnt, err)) =>
        val t = truth.getOrElse(key, 0L)
        cnt >= t && cnt - err <= t
      }
      val hitters = truth.forall { case (key, t) =>
        t <= items.length / 4 || s.contains(key) }
      val bounded = s.size <= 4
      mass && sandwich && hitters && bounded
    })
  }

  test("X119: fold composes across arbitrary batch boundaries") {
    check("composability", Prop.forAll(gStream, Gen.chooseNum(0, 100)) {
      (items, cutRaw) =>
        val cut = if (items.isEmpty) 0 else cutRaw % (items.length + 1)
        val (a, b) = items.splitAt(cut)
        StreamTopK.fold(StreamTopK.fold(Map.empty, a, k = 4), b, k = 4) ==
          StreamTopK.fold(Map.empty, items, k = 4)
    })
  }

  // ---- X116 doubled ranks -----------------------------------------------

  test("X116: on tie-free data the doubled-rank Pearson equals the classic 1 - 6*sum d^2 / (n(n^2-1))") {
    // deterministic permutations: generate a seed and shuffle with it
    val gSeeded = for {
      n <- Gen.chooseNum(2, 40)
      seed <- Gen.chooseNum(0L, Long.MaxValue / 2)
    } yield {
      val r = new scala.util.Random(seed)
      (Vector.range(1, n + 1), r.shuffle(Vector.range(1, n + 1)))
    }
    check("classic-identity", Prop.forAll(gSeeded) { case (xs, ys) =>
      val n = xs.length.toLong
      // tie-free: doubled rank of value v in 1..n is simply 2v
      val u = xs.map(_ * 2L)
      val v = ys.map(_ * 2L)
      val su = u.sum; val sv = v.sum
      val num = n * u.zip(v).map(p => p._1 * p._2).sum - su * sv
      val sxx = n * u.map(x => x * x).sum - su * su
      val syy = n * v.map(y => y * y).sum - sv * sv
      val rho = num.toDouble / math.sqrt(sxx.toDouble * syy.toDouble)
      val d2 = xs.zip(ys).map { case (a, b) =>
        val d = a.toLong - b.toLong; d * d }.sum
      val classic = 1.0 - 6.0 * d2 / (n * (n * n - 1.0))
      math.abs(rho - classic) < 1e-9
    })
  }

  // ---- X117 KS ------------------------------------------------------------

  test("X117: the spine max equals the brute-force sup over ALL reals") {
    val gTwo = for {
      a <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L))
      b <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L))
    } yield (a, b)
    check("spine-suffices", Prop.forAll(gTwo) { case (a, b) =>
      val na = a.length.toLong; val nb = b.length.toLong
      // spine form: evaluate only at observed values
      val spine = (a ++ b).distinct
      val dSpine = spine.map { t =>
        math.abs(a.count(_ <= t) * nb - b.count(_ <= t) * na) }.max
      // brute force: evaluate between every half-integer too — the CDFs
      // are flat between observed values, so nothing can hide there
      val fine = (0L to 41L).map(_.toDouble / 2 - 0.25)
      val dFine = fine.map { t =>
        math.abs(a.count(_ <= t) * nb - b.count(_ <= t) * na) }.max
      dSpine == dFine
    })
  }

  // ---- X121 Rand index ----------------------------------------------------

  test("X121: the pair-count formulas equal the naive O(n^2) pair loop") {
    val gPart = Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0, 4), Gen.chooseNum(0, 4)))
    check("pair-loop", Prop.forAll(gPart) { pairs0 =>
      val pairs = pairs0.take(60)
      val n = pairs.length.toLong
      def c2(x: Long) = x * (x - 1) / 2
      val a = pairs.groupBy(identity).values
        .map(g => c2(g.length.toLong)).sum
      val pc = pairs.groupBy(_._1).values
        .map(g => c2(g.length.toLong)).sum
      val pl = pairs.groupBy(_._2).values
        .map(g => c2(g.length.toLong)).sum
      val t = c2(n)
      // naive loop over unordered index pairs
      var ssBoth = 0L; var ssK = 0L; var ssC = 0L
      for (i <- pairs.indices; j <- pairs.indices if i < j) {
        val sameK = pairs(i)._1 == pairs(j)._1
        val sameC = pairs(i)._2 == pairs(j)._2
        if (sameK && sameC) ssBoth += 1
        if (sameK) ssK += 1
        if (sameC) ssC += 1
      }
      a == ssBoth && pc == ssK && pl == ssC &&
        (t - pc - pl + 2 * a) == (t - ssK - ssC + 2 * ssBoth)
    }, n = 100)
  }

  // ---- X125 winnowing guarantee -------------------------------------------

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  private def fingerprints(t: String): Set[Long] = {
    if (t.length < Winnow.K) return Set.empty
    val pb = 1L << Winnow.PosBits
    val keys = (1 to t.length - Winnow.K + 1).map { p =>
      md5Long40Ref(t.substring(p - 1, p - 1 + Winnow.K)) * pb +
        (pb - 1 - p) }
    keys.drop(Winnow.W - 1).indices
      .map(i => keys.slice(i, i + Winnow.W).min)
      .map(mk => (mk - Math.floorMod(mk, pb)) / pb).toSet
  }
  private object Winnow {
    val K = graft.ops.Winnowing.K
    val W = graft.ops.Winnowing.W
    val PosBits = graft.ops.Winnowing.PosBits
  }

  test("X125: any shared run of length >= 2(w+k-1) guarantees a shared fingerprint") {
    // 2(w+k−1) rather than the textbook w+k−1: the shared run must
    // contain a FULL window on both sides regardless of where it sits
    // relative to each doc's prefix (the p >= W full-window rule) —
    // with a run this long, at least one complete window of common
    // grams lies strictly inside it on both sides.
    val gLetters = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val gCase = for {
      pre1 <- gLetters; post1 <- gLetters
      pre2 <- gLetters; post2 <- gLetters
      runSeed <- Gen.listOfN(2 * (Winnow.W + Winnow.K - 1),
        Gen.alphaLowerChar)
    } yield (pre1.take(12), post1.take(12), pre2.take(12),
      post2.take(12), runSeed.mkString)
    check("guarantee", Prop.forAll(gCase) {
      case (p1, s1, p2, s2, run) =>
        val d1 = p1 + run + s1
        val d2 = p2 + run + s2
        (fingerprints(d1) intersect fingerprints(d2)).nonEmpty
    }, n = 100)
  }
}
