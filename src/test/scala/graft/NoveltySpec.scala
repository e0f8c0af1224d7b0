package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Novelty}

/** X82 — per-doc shingle novelty: must equal the driver-side
  * brute-force df accounting, with the exact-ratio identity and the
  * conservation law Σ n_unique = |shingles with df == 1|.
  */
class NoveltySpec extends SparkSpec {

  test("X82: novelty equals brute-force df recompute") {
    val sh = Dedup.shinglesOf(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("sh")))
    assert(sh.nonEmpty)
    val df = sh.groupBy(_._2).view.mapValues(_.length).toMap
    val expected = sh.groupBy(_._1).map { case (doc, xs) =>
      val nSh = xs.length.toLong
      val nUnique = xs.count(x => df(x._2) == 1).toLong
      doc -> ((nSh, nUnique, nUnique.toDouble / nSh.toDouble))
    }

    val got = Novelty.shingleNovelty(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_unique"),
          r.getAs[Double]("novelty_q"))))
      .toMap
    assert(got == expected)
    // conservation: every df==1 shingle is owned by exactly one doc
    val totalUnique = df.valuesIterator.count(_ == 1).toLong
    assert(got.valuesIterator.map(_._2).sum == totalUnique)
    // bounds: 0 <= novelty <= 1 with exact endpoints
    got.values.foreach { case (nSh, nUnique, q) =>
      assert(nUnique >= 0L && nUnique <= nSh)
      assert(q >= 0.0 && q <= 1.0)
    }
  }

  test("X82: crafted corpus pins the unique/shared split set-exactly") {
    import spark.implicits._
    // doc 1 and 2 share their entire text (all shingles df=2);
    // doc 3 is disjoint (all df=1); doc 4 mixes: first half shared
    // with doc 5, second half unique.
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "zeta eta theta iota kappa"),
      (4L, "lambda mu nu xi omicron pi rho"),
      (5L, "lambda mu nu xi sigma tau upsilon"))
      .toDF("doc_id", "text")
    val got = Novelty.noveltyOf(Dedup.shinglesOf(docs)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_sh"), r.getAs[Long]("n_unique")))).toMap
    // 5 words -> 3 shingles; docs 1,2 fully shared -> 0 unique
    assert(got(1L) == ((3L, 0L)) && got(2L) == ((3L, 0L)))
    // doc 3 disjoint -> all unique
    assert(got(3L) == ((3L, 3L)))
    // docs 4,5: "lambda mu nu", "mu nu xi" shared; the rest unique
    assert(got(4L) == ((5L, 3L)))
    assert(got(5L) == ((5L, 3L)))
  }
}
