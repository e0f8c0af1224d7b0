package graft

import graft.ops.JlProjection

/** X147 — signed random projection: exact driver-side i64 replay
  * (hash-derived signs recomputed from scratch), sign balance over the
  * (p, d) grid, the measured JL distance-preservation correlation on
  * corpus pairs, and partition invariance.
  */
class JlProjectionSpec extends SparkSpec {

  import spark.implicits._

  private def md5Long40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (8 until 13).map(i => (d(i) & 0xffL) << (8 * (i - 8))).sum
  }
  private def sign(p: Int, d: Int): Long =
    1L - 2L * (md5Long40(s"jl:$p:$d") & 1L)

  test("X147: exact driver-side i64 replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val expected = vecs.map { case (id, e) =>
      val q = e.map(v => math.floor(v.toDouble * 1e6).toLong)
      id -> (0 until JlProjection.P).map(p =>
        q.indices.map(d => sign(p, d) * q(d)).sum).toVector
    }.toMap
    val got = JlProjection.jlProjection(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val want = expected(r.getLong(0))
      (0 until JlProjection.P).foreach { p =>
        assert(r.getAs[Long](s"y$p") == want(p),
          s"vec ${r.get(0)} y$p: got ${r.get(p + 1)}, want ${want(p)}")
      }
    }
  }

  test("X147: hash signs are balanced over the (p, d) grid") {
    val signs = for (p <- 0 until JlProjection.P; d <- 0 until 64)
      yield sign(p, d)
    assert(signs.forall(s => s == 1L || s == -1L))
    val pos = signs.count(_ == 1L).toDouble / signs.size
    assert(pos > 0.4 && pos < 0.6, s"sign balance off: $pos positive")
  }

  test("X147: projected distances track original distances (JL property)") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray
        .map(v => math.floor(v.toDouble * 1e6).toLong)))
    val proj = JlProjection.jlProjection(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (0 until JlProjection.P).map(p => r.getAs[Long](s"y$p")).toArray)
      .toMap
    // deterministic pair sample: consecutive ids
    val ids = vecs.map(_._1).sorted
    val byId = vecs.toMap
    val pairs = ids.sliding(2).filter(_.length == 2).take(200).toSeq
    def d2(a: Array[Long], b: Array[Long]): Double =
      a.indices.map(i => { val d = (a(i) - b(i)).toDouble; d * d }).sum
    val (xs, ys) = pairs.map { w =>
      val (i, j) = (w(0), w(1))
      (d2(byId(i), byId(j)), d2(proj(i), proj(j)))
    }.unzip
    // expectation-isometry: E‖R(a−b)‖² = P·‖a−b‖² for ±1 rows, so the
    // mean distance ratio over pairs concentrates at P (per-pair std
    // ≈ √(2/P) ≈ 0.35·P; mean over 200 pairs ⇒ ±2.5%). The corpus
    // embeddings are near-uniform, so their pairwise distances
    // CONCENTRATE — a correlation test is weak by construction (the
    // signal is the tiny spread, measured r ≈ 0.34); the isometry law
    // is the right JL assertion and is pinned tight.
    val ratios = xs.zip(ys).map { case (x, y) => y / x }
    val meanRatio = ratios.sum / ratios.size
    val p = JlProjection.P.toDouble
    assert(meanRatio > 0.85 * p && meanRatio < 1.15 * p,
      s"mean distance ratio $meanRatio should concentrate at P = $p")
    // and per-pair: the ±1 construction never degenerates to zero or
    // explodes — per-pair ratio/P is ~χ²_P/P, whose far tails at
    // P = 16 reach ~0.25/~2.6 (measured extremes here: 0.24, 2.56);
    // the non-degeneracy band leaves 2× margin beyond those
    assert(ratios.forall(r => r > p / 8 && r < p * 8),
      s"pair ratio escaped the band: ${ratios.min} .. ${ratios.max}")
  }

  test("X147: partition-count invariance") {
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val one = JlProjection.projectionOf(e).collect().map(_.toString).toSeq
    val many = JlProjection.projectionOf(e.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
