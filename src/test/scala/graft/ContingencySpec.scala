package graft

import graft.ops.Contingency

/** X115 — exact contingency audit: hand-computed 2×2, the zero-cell
  * spine, exact independence ⇒ all-zero deviations, and an exact
  * driver-side replay on the real corpus.
  */
class ContingencySpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("a"), r.getAs[String]("b")) ->
      ((r.getAs[Long]("obs"), r.getAs[Long]("r_tot"),
        r.getAs[Long]("c_tot"), r.getAs[Long]("n_tot"),
        r.getAs[Long]("exp_num"), r.getAs[Long]("dev"),
        r.getAs[Double]("chi2_term")))).toMap

  test("X115: hand-computed 2x2 with a zero cell") {
    // rows: (u,p)=3, (u,q)=1, (v,p)=2; (v,q) unobserved
    // N=6; r_u=4, r_v=2; c_p=5, c_q=1
    val out = rowsOf(Contingency.contingencyOf(Seq(
      ("u", "p"), ("u", "p"), ("u", "p"), ("u", "q"),
      ("v", "p"), ("v", "p")).toDF("a", "b")))
    assert(out.size == 4) // full cross-product spine, zero cell present
    // dev = O*N - r*c
    assert(out(("u", "p")) ==
      ((3L, 4L, 5L, 6L, 20L, -2L, 4.0 / (4.0 * 5.0 * 6.0))))
    assert(out(("u", "q")) ==
      ((1L, 4L, 1L, 6L, 4L, 2L, 4.0 / (4.0 * 1.0 * 6.0))))
    assert(out(("v", "p")) ==
      ((2L, 2L, 5L, 6L, 10L, 2L, 4.0 / (2.0 * 5.0 * 6.0))))
    assert(out(("v", "q")) ==
      ((0L, 2L, 1L, 6L, 2L, -2L, 4.0 / (2.0 * 1.0 * 6.0))))
  }

  test("X115: exact independence gives all-zero deviations") {
    // product measure: every (a,b) count = r_a * c_b / N exactly
    val rows = for {
      (a, ra) <- Seq("u" -> 2, "v" -> 4)
      (b, cb) <- Seq("p" -> 1, "q" -> 2)
      _ <- 1 to ra * cb
    } yield (a, b) // N = 6*3 = 18, O(a,b) = ra*cb, r_a = 3*ra, c_b = 6*cb
    val out = rowsOf(Contingency.contingencyOf(rows.toDF("a", "b")))
    assert(out.size == 4)
    out.values.foreach { case (_, _, _, n, _, dev, chi2) =>
      assert(n == 18L); assert(dev == 0L); assert(chi2 == 0.0)
    }
  }

  test("X115: deviations sum to zero along every row and column") {
    val out = Contingency.contingencyOf(
      Tables.documents(spark, sfDir)
        .select($"lang".as("a"), $"source".as("b"))).collect()
    val byRow = out.groupBy(_.getAs[String]("a"))
      .view.mapValues(_.map(_.getAs[Long]("dev")).sum)
    val byCol = out.groupBy(_.getAs[String]("b"))
      .view.mapValues(_.map(_.getAs[Long]("dev")).sum)
    assert(byRow.values.forall(_ == 0L)) // Σ_b (O·N − r·c) = rN − rN
    assert(byCol.values.forall(_ == 0L))
  }

  test("X115: real corpus equals the exact integer replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val n = docs.length.toLong
    val cell = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val r = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val c = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val out = rowsOf(Contingency.contingencyOf(
      Tables.documents(spark, sfDir)
        .select($"lang".as("a"), $"source".as("b"))))
    assert(out.size == r.size * c.size)
    out.foreach { case ((a, b), (obs, rt, ct, nt, en, dev, _)) =>
      assert(obs == cell.getOrElse((a, b), 0L))
      assert(rt == r(a)); assert(ct == c(b)); assert(nt == n)
      assert(en == r(a) * c(b))
      assert(dev == obs * n - r(a) * c(b))
    }
  }
}
