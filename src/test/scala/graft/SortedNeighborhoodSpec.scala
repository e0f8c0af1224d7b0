package graft

import org.apache.spark.sql.DataFrame

import graft.ops.{CorpusIndex, Dedup, SortedNeighborhood}

/** X105 — sorted-neighborhood blocking: crafted rank fixtures (equal-key
  * adjacency, window overflow BY DESIGN, verify-stage rejection), a full
  * driver-side replay on the real corpus, and the measured recall vs the
  * X2 LSH pairs (the linear-cost/recall trade made visible).
  */
class SortedNeighborhoodSpec extends SparkSpec {

  import spark.implicits._

  /** Shingle + signature fixture from (doc_id, shingles, m0). */
  private def fixture(rows: Seq[(Long, Seq[String], Long)]): (DataFrame, DataFrame) = {
    val sh = rows.flatMap { case (id, shs, _) => shs.map((id, _)) }
      .toDF("doc_id", "sh")
    val sig = rows.map { case (id, shs, m0) => (id, shs.size.toLong, m0) }
      .toDF("doc_id", "n_sh", "m0")
    (sh, sig)
  }

  private def pairsOf(df: DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
      r.getAs[Double]("jaccard")).toMap

  test("X105: equal sort keys make adjacent ranks and the pair is found") {
    val (sh, sig) = fixture(Seq(
      (1L, Seq("a b c", "b c d"), 100L),
      (2L, Seq("a b c", "b c d"), 100L), // identical doc, same m0
      (3L, Seq("x y z", "y z w"), 900L)))
    val out = pairsOf(SortedNeighborhood.snFrom(sh, sig))
    assert(out == Map((1L, 2L) -> 1.0))
  }

  test("X105: a rank gap past the window is missed BY DESIGN") {
    // docs 1 and 9 are identical but 7 distinct keys apart in the sort
    // order — gap 8 > W=5, so the linear blocking never pairs them
    val spread = (2L to 8L).map(i =>
      (i, Seq(s"u$i v$i w$i", s"v$i w$i x$i"), i * 10L))
    val (sh, sig) = fixture(
      (1L, Seq("a b c", "b c d"), 5L) +: spread :+
        (9L, Seq("a b c", "b c d"), 95L))
    assert(SortedNeighborhood.snFrom(sh, sig).count() == 0)
    // same content at adjacent keys IS found — the window is the knob
    val (sh2, sig2) = fixture(Seq(
      (1L, Seq("a b c", "b c d"), 5L),
      (9L, Seq("a b c", "b c d"), 6L)))
    assert(pairsOf(SortedNeighborhood.snFrom(sh2, sig2)) ==
      Map((1L, 9L) -> 1.0))
  }

  test("X105: sub-threshold candidates are dropped by the verify stage") {
    // adjacent ranks, but only 1 of 3+3 shingles shared → J = 1/5 < 0.5
    val (sh, sig) = fixture(Seq(
      (1L, Seq("a b c", "c d e", "e f g"), 10L),
      (2L, Seq("a b c", "p q r", "r s t"), 11L)))
    assert(SortedNeighborhood.snFrom(sh, sig).count() == 0)
  }

  /** Portable 40-bit md5, mirroring Hashing.md5Long40 driver-side. */
  private def md5l40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (d(8).toLong & 0xffL) | ((d(9).toLong & 0xffL) << 8) |
      ((d(10).toLong & 0xffL) << 16) | ((d(11).toLong & 0xffL) << 24) |
      ((d(12).toLong & 0xffL) << 32)
  }

  test("X105: real corpus equals the driver-side replay; recall measured") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val shingles = docs.map { case (id, text) =>
      val ws = text.toLowerCase.trim.split("\\s+")
      id -> ws.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    }.toMap
    val m0 = shingles.collect { case (id, shs) if shs.nonEmpty =>
      id -> shs.map(s => (md5l40(s) * Dedup.A(0) + Dedup.B(0)) % Dedup.P).min }
    // docs with no 3-gram never enter the signature table, hence no rank
    val ranked = docs.map(_._1).filter(m0.contains).sortBy(id => (m0(id), id))
    val expected = (for {
      i <- ranked.indices
      j <- (i + 1) to math.min(i + SortedNeighborhood.WindowSize, ranked.size - 1)
      a = math.min(ranked(i), ranked(j)); b = math.max(ranked(i), ranked(j))
      inter = (shingles(a) & shingles(b)).size
      jac = inter.toDouble / (shingles(a).size + shingles(b).size - inter)
      if jac >= 0.5
    } yield (a, b) -> jac).toMap
    val got = pairsOf(SortedNeighborhood.snDedup(spark, sfDir))
    assert(got == expected)

    // recall vs the X2 LSH verified pairs — the linear-cost trade, as
    // data: m0 agreement alone catches a ≥0.5-Jaccard pair with P ≥ 0.5,
    // so require at least a third here and print the measurement
    val lsh = CorpusIndex.minhashScores(spark, sfDir)
      .filter($"jaccard" >= 0.5)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    if (lsh.nonEmpty) {
      val caught = lsh.count(got.keySet)
      info(s"sorted-neighborhood recall vs x02: $caught/${lsh.size}")
      assert(caught.toDouble / lsh.size >= 0.33)
    }
  }
}
