package graft

import graft.ops.{Text, ThresholdSweep}

/** X85 — threshold sweep: exact driver-side replay from the x10 scores
  * (the scorer itself is parity-pinned elsewhere), monotonicity of the
  * curve, and the zero-cutoff totals row.
  */
class ThresholdSweepSpec extends SparkSpec {

  private lazy val scored = Text.qualityOf(Tables.documents(spark, sfDir))
    .select("quality_score", "n_tokens").collect()
    .map(r => (r.getAs[Double]("quality_score"), r.getAs[Long]("n_tokens")))

  private lazy val got =
    ThresholdSweep.thresholdSweepOf(Tables.documents(spark, sfDir)).collect()

  test("X85: every cutoff row equals the driver-side bucket replay") {
    val b = ThresholdSweep.Buckets
    val bucketOf = (s: Double) => math.min(math.floor(s * b).toLong, b - 1L)
    val expected = (0 until b).map { thr =>
      val kept = scored.filter(d => bucketOf(d._1) >= thr)
      thr.toLong -> ((kept.length.toLong, kept.map(_._2).sum))
    }.toMap
    val gotMap = got.map(r => r.getAs[Long]("thr_bucket") ->
      ((r.getAs[Long]("n_kept"), r.getAs[Long]("tok_kept")))).toMap
    assert(gotMap == expected)
    assert(gotMap.size == b, "the curve must carry ALL cutoffs, zeros included")
  }

  test("X85: a cutoff nothing survives appears as an explicit zero row") {
    import spark.implicits._
    // three short low-score docs: the top buckets are empty and must
    // still show up with n_kept = 0, not vanish from the curve
    val docs = Seq((1L, "a b"), (2L, "c d"), (3L, "e f"))
      .toDF("doc_id", "text")
    val rows = ThresholdSweep.thresholdSweepOf(docs).collect()
    assert(rows.length == ThresholdSweep.Buckets)
    val top = rows.filter(_.getAs[Long]("thr_bucket") == 19L)
    assert(top.length == 1 && top.head.getAs[Long]("n_kept") == 0L &&
      top.head.getAs[Double]("doc_frac_q") == 0.0)
  }

  test("X85: kept counts are non-increasing in the cutoff") {
    val byThr = got.sortBy(_.getAs[Long]("thr_bucket"))
    val keeps = byThr.map(_.getAs[Long]("n_kept"))
    val toks = byThr.map(_.getAs[Long]("tok_kept"))
    assert(keeps.zip(keeps.tail).forall { case (a, c) => a >= c })
    assert(toks.zip(toks.tail).forall { case (a, c) => a >= c })
  }

  test("X85: cutoff 0 keeps the whole corpus with fraction exactly 1.0") {
    val z = got.find(_.getAs[Long]("thr_bucket") == 0L).get
    assert(z.getAs[Long]("n_kept") == scored.length.toLong)
    assert(z.getAs[Long]("tok_kept") == scored.map(_._2).sum)
    assert(z.getAs[Double]("doc_frac_q") == 1.0)
    assert(z.getAs[Double]("tok_frac_q") == 1.0)
  }
}
