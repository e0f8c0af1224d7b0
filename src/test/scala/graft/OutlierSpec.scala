package graft

import org.apache.spark.sql.functions._

import graft.ops.Outlier

/** X156 — embedding outliers: a planted far vector ranks first with the
  * hand-computable score, ties break on vec_id, constant dims
  * contribute nothing (and never divide by zero), ranks are dense
  * 1..K, and the score is partition-invariant.
  */
class OutlierSpec extends SparkSpec {

  import spark.implicits._

  test("X156: a planted far vector ranks first; constant dims are inert") {
    // 40 inliers at ±0.1 alternating (mean 0, var 0.01 per dim), one
    // vector at 1.0 in dim 0 only; dim 2 is CONSTANT (var 0 — must not
    // blow up or contribute)
    val inliers = (1L to 40L).map { i =>
      val s = if (i % 2 == 0) 0.1f else -0.1f
      (i, "in", Array(s, s, 0.5f, s))
    }
    val e = (inliers :+ ((99L, "out",
      Array(1.0f, 0.1f, 0.5f, 0.1f)))).toDF("vec_id", "label", "embedding")
    val out = Outlier.outliersOf(e).collect()
    assert(out.head.getAs[Long]("vec_id") == 99L,
      "the planted vector must rank first")
    assert(out.head.getAs[Long]("rank") == 1L)
    // dense ranks, monotone scores
    val ranks = out.map(_.getAs[Long]("rank")).toSeq
    assert(ranks == (1L to ranks.length).toSeq)
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse)
    // the outlier's score dwarfs every inlier's
    assert(scores.head > 2.0 * scores(1))
  }

  test("X156: ties break on vec_id ascending") {
    val e = Seq(
      (5L, "a", Array(1.0f, 0.0f)),
      (3L, "a", Array(1.0f, 0.0f)),
      (1L, "a", Array(-1.0f, 0.0f)),
      (2L, "a", Array(-1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Outlier.outliersOf(e).collect()
    // all four are symmetric around the mean — identical scores; the
    // rank order must then be vec_id ascending
    assert(out.map(_.getAs[Double]("score")).distinct.length == 1)
    assert(out.map(_.getAs[Long]("vec_id")).toSeq == Seq(1L, 2L, 3L, 5L))
  }

  test("X156: top-K bound and corpus sanity") {
    val out = Outlier.embeddingOutliers(spark, sfDir).collect()
    assert(out.length == Outlier.K)
    assert(out.map(_.getAs[Long]("vec_id")).distinct.length == out.length)
    out.foreach(r => assert(r.getAs[Double]("score") >= 0.0))
  }

  test("X156: partition-count invariance") {
    val e = Tables.embeddings(spark, sfDir)
    val one = Outlier.outliersOf(e).collect().map(_.toString).toSeq
    val many = Outlier.outliersOf(e.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
