package graft

import graft.ops.CentroidDrift

/** X160 — centroid stability: identical batches drift zero with cosine
  * 1, a planted batch shift reports the hand-computable distance, a
  * single-batch label reports NULL drift, and the audit is
  * partition-invariant.
  */
class CentroidDriftSpec extends SparkSpec {

  import spark.implicits._

  test("X160: identical batches drift zero with cosine 1") {
    // even/odd vec_ids carry the SAME two vectors ⇒ equal centroids
    val e = Seq(
      (0L, "a", Array(1.0f, 0.0f, 0.5f)),
      (2L, "a", Array(0.0f, 1.0f, 0.5f)),
      (1L, "a", Array(1.0f, 0.0f, 0.5f)),
      (3L, "a", Array(0.0f, 1.0f, 0.5f)))
      .toDF("vec_id", "label", "embedding")
    val r = CentroidDrift.driftOf(e).collect()(0)
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Double]("l2sq_drift") == 0.0)
    // cosQ of equal vectors is dq/(√n·√n) — 1 up to one IEEE ulp
    assert(math.abs(r.getAs[Double]("cos_batches") - 1.0) < 1e-12)
  }

  test("X160: a planted shift reports the hand distance") {
    // batch a at (1,0), batch b at (0,1): l2² = 2, cos = 0
    val e = Seq(
      (0L, "a", Array(1.0f, 0.0f)),
      (1L, "a", Array(0.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val r = CentroidDrift.driftOf(e).collect()(0)
    assert(r.getAs[Long]("n_a") == 1L && r.getAs[Long]("n_b") == 1L)
    assert(math.abs(r.getAs[Double]("l2sq_drift") - 2.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("cos_batches")) < 1e-12)
  }

  test("X160: a single-batch label reports NULL drift, not a fake zero") {
    val e = Seq(
      (2L, "only_even", Array(1.0f, 0.0f)),
      (4L, "only_even", Array(0.9f, 0.1f)),
      (0L, "both", Array(1.0f, 0.0f)),
      (1L, "both", Array(1.0f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val rows = CentroidDrift.driftOf(e).collect()
      .map(r => r.getString(0) -> r).toMap
    val oe = rows("only_even")
    assert(oe.getAs[Long]("n_b") == 0L)
    assert(oe.isNullAt(oe.fieldIndex("l2sq_drift")))
    assert(oe.isNullAt(oe.fieldIndex("cos_batches")))
    assert(rows("both").getAs[Double]("l2sq_drift") == 0.0)
  }

  test("X160: corpus audit is total and well-formed") {
    val out = CentroidDrift.centroidDrift(spark, sfDir).collect()
    assert(out.nonEmpty)
    val e = Tables.embeddings(spark, sfDir)
    assert(out.map(r => r.getAs[Long]("n_a") + r.getAs[Long]("n_b")).sum
      == e.count(), "every vector lands in exactly one batch")
    out.foreach { r =>
      assert(r.getAs[Long]("n_a") > 0L && r.getAs[Long]("n_b") > 0L)
      // the corpus embeddings are near-zero-mean noise per label, so
      // the batch centroids are SMALL — drift must be bounded by the
      // noise scale (‖δ‖² ≪ 1), while cosine between two tiny noise
      // vectors is legitimately arbitrary in [−1, 1]
      val d = r.getAs[Double]("l2sq_drift")
      assert(d >= 0.0 && d < 0.5, s"label ${r.get(0)}: drift $d")
      val c = r.getAs[Double]("cos_batches")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
    }
  }

  test("X160: partition-count invariance") {
    val e = Tables.embeddings(spark, sfDir)
    val one = CentroidDrift.driftOf(e).collect().map(_.toString).toSeq
    val many = CentroidDrift.driftOf(e.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
