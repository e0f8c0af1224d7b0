package graft

import graft.ops.Wasserstein

/** X141 — exact Wasserstein-1 source drift: identical distributions ⇒
  * exactly 0, a point mass shifted by d ⇒ w1_q exactly d, a
  * hand-computed mixed fixture, exact driver-side BigInt corpus replay,
  * scale equivariance (v → 2v doubles W₁), and partition invariance.
  */
class WassersteinSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Tables.documents(spark, sfDir)
    .select($"source".as("grp"), $"n_chars".as("v"))

  test("X141: identical distributions give exactly zero") {
    val rows = Seq(("a", 10L), ("a", 20L), ("a", 20L),
      ("b", 10L), ("b", 20L), ("b", 20L)).toDF("grp", "v")
    Wasserstein.w1Of(rows).collect().foreach { r =>
      assert(r.getAs[Double]("w1_num") == 0.0)
      assert(r.getAs[Double]("w1_q") == 0.0)
    }
  }

  test("X141: a point mass shifted by d has w1_q exactly d") {
    val rows = (Seq.fill(4)(("a", 10L)) ++ Seq.fill(7)(("b", 17L)))
      .toDF("grp", "v")
    val out = Wasserstein.w1Of(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1_q")).toMap
    assert(out("a") == 7.0 && out("b") == 7.0)
  }

  test("X141: hand-computed mixed fixture") {
    // a: {1, 3}; b: {3, 5}. Spine 1,3,5; n_in = n_rest = 2.
    // For a: |cum_a*2 - cum_b*2| at v=1: |1*2-0*2|=2 gap 2 -> 4
    //        at v=3: |2*2-1*2|=2 gap 2 -> 4; v=5 last gap 0.
    // w1_num = 8, w1_q = 8/4 = 2.
    val rows = Seq(("a", 1L), ("a", 3L), ("b", 3L), ("b", 5L))
      .toDF("grp", "v")
    val out = Wasserstein.w1Of(rows).collect()
      .map(r => (r.getString(0),
        r.getAs[Double]("w1_num"), r.getAs[Double]("w1_q"))).toSet
    assert(out == Set(("a", 8.0, 2.0), ("b", 8.0, 2.0)))
  }

  test("X141: exact driver-side BigInt corpus replay") {
    val data = corpus.collect().map(r => (r.getString(0), r.getLong(1)))
    val spine = data.map(_._2).distinct.sorted
    val total = data.length.toLong
    val expected = data.groupBy(_._1).map { case (g, rs) =>
      val nIn = rs.length.toLong
      val nRest = total - nIn
      val inCnt = rs.groupBy(_._2).map { case (v, x) => v -> x.length.toLong }
      val allCnt = data.groupBy(_._2).map { case (v, x) => v -> x.length.toLong }
      var cumIn = 0L
      var cumAll = 0L
      var num = BigInt(0)
      spine.zipWithIndex.foreach { case (v, i) =>
        cumIn += inCnt.getOrElse(v, 0L)
        cumAll += allCnt(v)
        val gap = if (i + 1 < spine.length) spine(i + 1) - v else 0L
        num += BigInt(gap) *
          (BigInt(cumIn) * nRest - BigInt(cumAll - cumIn) * nIn).abs
      }
      g -> (nIn, nRest, num)
    }
    val got = Wasserstein.sourceLengthW1(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nIn, nRest, num) = expected(r.getString(0))
      assert(r.getAs[Long]("n_in") == nIn)
      assert(r.getAs[Long]("n_rest") == nRest)
      assert(r.getAs[Double]("w1_num") == num.toDouble,
        s"w1_num mismatch for ${r.get(0)}")
      assert(r.getAs[Double]("w1_q") ==
        num.toDouble / (nIn * nRest).toDouble)
    }
  }

  test("X141: scale equivariance — doubling lengths doubles W1") {
    val base = Wasserstein.w1Of(corpus).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("w1_q")).toMap
    val doubled = Wasserstein.w1Of(corpus.withColumn("v", $"v" * 2))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("w1_q")).toMap
    assert(base.keySet == doubled.keySet)
    base.foreach { case (g, w) => assert(doubled(g) == 2.0 * w) }
  }

  test("X141: partition-count invariance") {
    val one = Wasserstein.w1Of(corpus).collect().map(_.toString).toSeq
    val many = Wasserstein.w1Of(corpus.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
