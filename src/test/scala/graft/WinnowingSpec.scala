package graft

import java.security.MessageDigest

import graft.ops.Winnowing

/** X125 — winnowing: the shared-substring selection guarantee on
  * crafted docs, disjoint-alphabet isolation, the fingerprint density
  * bound, and an exact full-chain driver replay (clean → grams → md5 →
  * pack → window min → match) on the real corpus.
  */
class WinnowingSpec extends SparkSpec {

  import spark.implicits._

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  /** Exact driver replay of the fingerprint selection for one text. */
  private def fingerprintsRef(text: String): Set[Long] = {
    val t = text.toLowerCase.replaceAll("\\s+", " ")
    if (t.length < Winnowing.K) return Set.empty
    val pb = 1L << Winnowing.PosBits
    val keys = (1 to t.length - Winnowing.K + 1).map { p =>
      val h = md5Long40Ref(t.substring(p - 1, p - 1 + Winnowing.K))
      (p, h * pb + (pb - 1 - p))
    }
    keys.drop(Winnowing.W - 1).indices.map { i =>
      // window ending at index i + W - 1 (full windows only)
      keys.slice(i, i + Winnowing.W).map(_._2).min
    }.map(mk => (mk - Math.floorMod(mk, pb)) / pb).toSet
  }

  test("X125: a dominant shared substring guarantees a match") {
    val shared = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (1L, s"aa bb $shared cc"),
      (2L, s"zz $shared qq rr")
    ).toDF("doc_id", "text")
    val out = Winnowing.matchOf(docs).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_a") == 1L)
    assert(out.head.getAs[Long]("doc_b") == 2L)
    val (shr, na, nb) = (out.head.getAs[Long]("n_shared"),
      out.head.getAs[Long]("nf_a"), out.head.getAs[Long]("nf_b"))
    assert(shr >= 2L)
    assert(shr * 2 >= math.min(na, nb)) // the containment gate itself
  }

  test("X125: disjoint alphabets share nothing") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh"),
      (2L, "pppp qqqq rrrr ssss tttt uuuu vvvv wwww")
    ).toDF("doc_id", "text")
    assert(Winnowing.matchOf(docs).count() == 0L)
  }

  test("X125: fingerprint density is the winnowing fraction, not all grams") {
    val text = Tables.documents(spark, sfDir)
      .orderBy($"doc_id").select($"text").head().getString(0)
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val nFp = Winnowing.fingerprintsOf(docs).count()
    val t = text.toLowerCase.replaceAll("\\s+", " ")
    val nGrams = (t.length - Winnowing.K + 1).toLong
    assert(nFp > 0)
    assert(nFp < nGrams, "winnowing must select a strict subset")
    // expected density ≈ 2/(w+1) = 0.4; allow a wide band
    assert(nFp.toDouble / nGrams < 0.8)
  }

  test("X125: native winnow kernel ≡ column form on the full corpus (multiset-exact)") {
    val docs = Tables.documents(spark, sfDir)
    val native = Winnowing.fpAllOf(docs)
    val column = Winnowing.fpAllColumnOf(docs)
    // exceptAll both ways: also proves the kernel's per-doc set is
    // genuinely distinct (a duplicate (doc_id, h) would survive the
    // multiset subtraction against the distinct column form)
    assert(native.exceptAll(column).count() == 0L)
    assert(column.exceptAll(native).count() == 0L)
    assert(native.count() > 0L)
  }

  test("X125: real corpus equals the exact full-chain replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val fpsAll = docs.map { case (id, t) => id -> fingerprintsRef(t) }.toMap
    // MOSS common-code elimination: df > MaxDf hashes leave the match
    val df = fpsAll.values.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val fps = fpsAll.view
      .mapValues(_.filter(h => df(h) <= Winnowing.MaxDf)).toMap
    val expected = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq
      if a < b
      shared = (fa intersect fb).size.toLong
      if shared >= 2 && shared * 2 >= math.min(fa.size, fb.size)
    } yield (a, b) -> ((shared, fa.size.toLong, fb.size.toLong))).toMap
    val got = Winnowing.winnowingMatch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "the corpus does contain winnowing matches")
  }
}
