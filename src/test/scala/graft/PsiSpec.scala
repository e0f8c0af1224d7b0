package graft

import graft.ops.Psi

/** X163 — PSI: proportionally identical distributions score exactly 0,
  * a fully-shifted group crosses the conventional 0.25 alarm, scores
  * are non-negative, band counts conserve, and the score is
  * partition-invariant.
  */
class PsiSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(String, Long)]) = rows.toDF("grp", "v")

  test("X163: proportionally identical groups score exactly zero") {
    // both groups carry the SAME band histogram at the SAME size, so
    // every smoothed share pair is identical ⇒ every term is exactly 0
    val hist = Seq(50L -> 30, 250L -> 50, 850L -> 20)
    val rows = for {
      g <- Seq("a", "b"); (v, k) <- hist; i <- 1 to k
    } yield (g, v + (i % 7)) // stay inside the band
    val out = frame(rows).transform(Psi.psiOf).collect()
    out.foreach { r =>
      assert(r.getAs[Double]("psi") == 0.0,
        s"grp ${r.get(0)}: identical shares must score exactly 0")
    }
  }

  test("X163: a fully shifted group crosses the 0.25 drift alarm") {
    val rows = (1 to 200).map(i => ("low", 30L + i % 50)) ++
      (1 to 200).map(i => ("high", 930L + i % 50))
    val out = frame(rows).transform(Psi.psiOf).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(out("low") > 0.25, s"low scored ${out("low")}")
    assert(out("high") > 0.25, s"high scored ${out("high")}")
  }

  test("X163: corpus scores are non-negative and bands conserve") {
    val out = Psi.psiDrift(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("psi") >= 0.0,
        s"grp ${r.get(0)}: PSI is a sum of non-negative terms")
      val bandSum = (0 until Psi.Bands)
        .map(i => r.getAs[Long](s"c$i")).sum
      assert(bandSum == r.getAs[Long]("n_in"),
        "every doc lands in exactly one band")
    }
  }

  test("X163: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as("grp"), $"n_chars".as("v"))
    val one = Psi.psiOf(docs).collect().map(_.toString).toSeq
    val many = Psi.psiOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
