package graft

import java.security.MessageDigest

import graft.ops.AmsF2

/** X136 — AMS F2 sketch: exactness in the single-value skew regime
  * (the blow-up the op exists to detect), the LINEAR merge law
  * (counters add across disjoint shards — the strongest mergeability
  * in the sketch family), partition-count invariance, and the exact
  * driver-side replay of signs, counters, and the floor-div estimate
  * on the real corpus.
  */
class AmsF2Spec extends SparkSpec {

  import spark.implicits._

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  private def counters(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getAs[String]("grp") ->
        (0 until AmsF2.R).map(i => r.getAs[Long](s"x$i")).toVector
    }.toMap

  test("X136: a single-value group estimates its F2 exactly") {
    // every sign function sees n identical rows → X_r = ±n → est = n²
    val rows = Seq.fill(37)(("g", "the one boilerplate template"))
      .toDF("grp", "v")
    val out = AmsF2.f2Of(rows).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_rows") == 37L)
    assert(out(0).getAs[Long]("n_distinct") == 1L)
    assert(out(0).getAs[Long]("exact_f2") == 37L * 37L)
    assert(out(0).getAs[Long]("est_f2") == 37L * 37L,
      "single-distinct-value group must estimate exactly")
  }

  test("X136: counters are linear — shard sketches merge by addition") {
    val docs = Tables.documents(spark, sfDir).select(
      $"source".as("grp"), $"text".as("v"), $"doc_id")
    val a = counters(AmsF2.sketchOf(docs.filter($"doc_id" % 2 === 0)))
    val b = counters(AmsF2.sketchOf(docs.filter($"doc_id" % 2 =!= 0)))
    val full = counters(AmsF2.sketchOf(docs))
    assert(full.keySet == (a.keySet ++ b.keySet))
    full.foreach { case (g, xs) =>
      val za = a.getOrElse(g, Vector.fill(AmsF2.R)(0L))
      val zb = b.getOrElse(g, Vector.fill(AmsF2.R)(0L))
      assert(xs == za.zip(zb).map { case (p, q) => p + q },
        s"$g: X(A ⊎ B) must equal X(A) + X(B)")
    }
  }

  test("X136: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir).select(
      $"source".as("grp"), $"text".as("v"))
    val one = AmsF2.f2Of(docs).collect().map(_.toString).toSeq
    val seven = AmsF2.f2Of(docs.repartition(7)).collect()
      .map(_.toString).toSeq
    assert(one == seven)
  }

  test("X136: real corpus equals the exact driver-side replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).map { case (grp, g) =>
      val xs = (0 until AmsF2.R).map { r =>
        g.map { d =>
          if (((md5Long40Ref(d._2) >> r) & 1L) == 1L) 1L else -1L
        }.sum
      }
      val exact = g.groupBy(_._2).values
        .map(c => c.size.toLong * c.size).sum
      grp -> (g.size.toLong, g.map(_._2).distinct.size.toLong,
        Math.floorDiv(xs.map(x => x * x).sum, AmsF2.R.toLong), exact)
    }
    val got = AmsF2.amsF2(spark, sfDir).collect()
      .map(r => r.getAs[String]("grp") -> r).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (grp, (n, nd, est, exact)) =>
      val r = got(grp)
      assert(r.getAs[Long]("n_rows") == n, s"$grp n_rows")
      assert(r.getAs[Long]("n_distinct") == nd, s"$grp n_distinct")
      assert(r.getAs[Long]("est_f2") == est, s"$grp est_f2")
      assert(r.getAs[Long]("exact_f2") == exact, s"$grp exact_f2")
    }
  }

  test("X136: corpus relative error sits inside the mean-of-R band") {
    // the spec corpus is 25 unique docs per source — the deep end of
    // the diffuse regime, where a single source's mean-of-32 estimate
    // legitimately wanders (observed max 0.76 here; the √(2/R) ≈ 25%
    // stderr is an asymptotic). Two deterministic pins on the fixed
    // corpus: every source within 1.0 relative (a sign-bias bug is
    // O(n) = 25× off, not 2×), and the cross-source MEAN within 0.4
    // (stderr of the 20-source mean ≈ 0.25/√20 ≈ 0.06).
    val rows = AmsF2.amsF2(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val rels = rows.map { r =>
      val est = r.getAs[Long]("est_f2").toDouble
      val exact = r.getAs[Long]("exact_f2").toDouble
      val rel = math.abs(est - exact) / exact
      assert(rel <= 1.0,
        s"${r.getAs[String]("grp")}: rel err $rel outside the band " +
          s"(est $est, exact $exact)")
      rel
    }
    assert(rels.sum / rels.length <= 0.4,
      s"mean rel err ${rels.sum / rels.length} outside the band")
  }
}
