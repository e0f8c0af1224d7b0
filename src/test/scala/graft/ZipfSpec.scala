package graft

import graft.ops.Zipf

/** X154 — Zipf fit: an exact power law recovers its exponent, a uniform
  * distribution fits slope 0, the head cut respects the (freq, word)
  * total order, degenerate sources report NULL, and the fit is
  * partition-invariant on the corpus.
  */
class ZipfSpec extends SparkSpec {

  import spark.implicits._

  private def corpusOf(wordCounts: Seq[(String, Int)], src: String = "s") = {
    // one document carrying each word `count` times — term frequency is
    // what x154 ranks, so the doc structure is irrelevant
    val text = wordCounts.flatMap { case (w, c) => Seq.fill(c)(w) }
      .mkString(" ")
    Seq((src, text)).toDF("source", "text")
  }

  test("X154: an exact Zipf corpus recovers slope −1") {
    // freq(rank) = 720720 / rank for ranks 1..16 — exactly on the law
    val words = (1 to 16).map(r => (s"w${('a' + r).toChar}$r", 720720 / r))
    val out = Zipf.zipfFitOf(corpusOf(words)).collect()(0)
    assert(out.getAs[Long]("n_terms") == 16L)
    val slope = out.getAs[Double]("slope")
    assert(math.abs(slope - (-1.0)) < 1e-3,
      s"exact-Zipf corpus must fit slope ≈ −1, got $slope")
  }

  test("X154: a uniform corpus fits slope 0") {
    val words = (1 to 20).map(r => (f"u$r%02d", 50))
    val out = Zipf.zipfFitOf(corpusOf(words)).collect()(0)
    val slope = out.getAs[Double]("slope")
    assert(math.abs(slope) < 1e-12,
      s"equal frequencies have zero covariance with rank, got $slope")
  }

  test("X154: a single-term source reports NULL slope") {
    val out = Zipf.zipfFitOf(corpusOf(Seq(("only", 9)))).collect()(0)
    assert(out.getAs[Long]("n_terms") == 1L)
    assert(out.isNullAt(out.fieldIndex("slope")))
    assert(out.isNullAt(out.fieldIndex("intercept")))
  }

  test("X154: steeper-than-Zipf ranks steeper; corpus slopes are negative") {
    // freq ∝ rank^-2 must fit ≈ −2
    val words = (1 to 12).map(r => (s"v$r", 166320 / (r * r)))
    val steep = Zipf.zipfFitOf(corpusOf(words)).collect()(0)
      .getAs[Double]("slope")
    assert(math.abs(steep - (-2.0)) < 1e-2)
    // and the real corpus: every source fits a negative slope over a
    // non-trivial head
    val rows = Zipf.zipfFit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_terms") > 10L)
      assert(r.getAs[Double]("slope") < 0.0,
        s"source ${r.get(0)}: natural text must slope down")
    }
  }

  test("X154: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val one = Zipf.zipfFitOf(docs).collect().map(_.toString).toSeq
    val many = Zipf.zipfFitOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
