package graft

import graft.ops.LmScore

/** X49 — bigram coverage scoring: hand-corpus semantics (reference
  * slice, hit counting, mass weighting) and the corpus-level
  * separation property the filter exists for.
  */
class LmScoreSpec extends SparkSpec {

  test("X49: hits and mass count against the reference slice only") {
    import spark.implicits._
    val docs = Seq(
      (1L, "en", "the cat sat"),          // ref: bigrams "the cat", "cat sat"
      (2L, "en", "the cat ran"),          // ref: "the cat", "cat ran"
      (3L, "de", "the cat sat on mats"),  // scored against the en model
      (4L, "de", "xx yy")                 // zero hits
    ).toDF("doc_id", "lang", "text")
    val rows = LmScore.coverageOf(docs, "en").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 3: bigrams = the-cat, cat-sat, sat-on, on-mats; the-cat has
    // ref count 2, cat-sat has 1, others unseen
    val d3 = rows(3L)
    assert(d3.getAs[Long]("n_bigrams") == 4L)
    assert(d3.getAs[Long]("n_hits") == 2L)
    assert(d3.getAs[Double]("coverage") == 0.5)
    assert(d3.getAs[Double]("avg_hit_count") == (2.0 + 1.0) / 2)
    val d4 = rows(4L)
    assert(d4.getAs[Long]("n_hits") == 0L)
    assert(d4.isNullAt(d4.fieldIndex("avg_hit_count")))
    // reference docs score against their own model too (leave-in)
    assert(rows(1L).getAs[Double]("coverage") == 1.0)
  }

  test("X49: reference-language docs cover better than others on the corpus") {
    import spark.implicits._
    val scored = LmScore.lmCoverage(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"lang"), "doc_id")
      .collect()
    val (en, rest) = scored.partition(_.getAs[String]("lang") == LmScore.RefLang)
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(xs: Array[Double]) = xs.sum / xs.length
    val enCov = mean(en.map(_.getAs[Double]("coverage")))
    val restCov = mean(rest.map(_.getAs[Double]("coverage")))
    assert(enCov > restCov,
      s"en mean coverage $enCov must exceed non-en $restCov")
  }
}
