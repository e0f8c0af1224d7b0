package graft

import graft.ops.Richness

/** X107 — vocabulary richness: hand-computed frequency-of-frequencies
  * fixtures (Chao1 bias-corrected fraction, Good–Turing mass, the
  * f2=0 case the correction exists for) and an exact driver-side
  * replay on the real corpus.
  */
class RichnessSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("lang") ->
      ((r.getAs[Long]("n_tokens"), r.getAs[Long]("v_obs"),
        r.getAs[Long]("f1"), r.getAs[Long]("f2"),
        r.getAs[Long]("chao1_num"), r.getAs[Long]("chao1_den"),
        r.getAs[Double]("chao1_q"), r.getAs[Double]("gt_q")))).toMap

  test("X107: hand-computed singleton/doubleton census") {
    // lang aa: tokens = a a a b b c d → V=4, f1={c,d}=2, f2={b}=1,
    // n=7; chao1 = 4 + 2·1/(2·2) = 4.5 → num = 4·4+2 = 18, den = 4
    val docs = Seq(("a a a b b", "aa"), ("c d", "aa")).toDF("text", "lang")
    assert(rowsOf(Richness.richnessOf(docs)) == Map(
      "aa" -> ((7L, 4L, 2L, 1L, 18L, 4L, 4.5, 2.0 / 7.0))))
  }

  test("X107: f2=0 stays finite (the bias-corrected form's point)") {
    // lang bb: a b c — all singletons: V=3, f1=3, f2=0;
    // chao1 = 3 + 3·2/(2·1) = 6 → num = 3·2+6 = 12, den = 2
    val docs = Seq(("a b c", "bb")).toDF("text", "lang")
    assert(rowsOf(Richness.richnessOf(docs)) == Map(
      "bb" -> ((3L, 3L, 3L, 0L, 12L, 2L, 6.0, 1.0))))
  }

  test("X107: real corpus equals the exact replay") {
    val rows = Tables.documents(spark, sfDir)
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = rows.groupBy(_._1).view.mapValues { ds =>
      val freq = ds.flatMap(_._2.toLowerCase.trim.split("\\s+"))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = freq.values.sum
      val v = freq.size.toLong
      val f1 = freq.values.count(_ == 1L).toLong
      val f2 = freq.values.count(_ == 2L).toLong
      val num = v * 2 * (f2 + 1) + f1 * (f1 - 1)
      val den = 2 * (f2 + 1)
      (n, v, f1, f2, num, den, num.toDouble / den.toDouble,
        f1.toDouble / n.toDouble)
    }.toMap
    assert(rowsOf(Richness.vocabRichness(spark, sfDir)) == expected)
  }
}
