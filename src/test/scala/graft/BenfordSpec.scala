package graft

import graft.ops.Benford

/** X155 — Benford audit: the probability literals are the law, a
  * log-uniform sample passes (small χ²), a uniform sample fails (the
  * statistic separates shapes), digit extraction is exact on hand
  * values, counts conserve, and the audit is partition-invariant.
  */
class BenfordSpec extends SparkSpec {

  import spark.implicits._

  test("X155: the embedded probabilities are Benford's law") {
    assert(Benford.P.length == 9)
    assert(math.abs(Benford.P.sum - 1.0) < 1e-12,
      "the nine first-digit probabilities must sum to 1")
    assert(math.abs(Benford.P.head - 0.30102999566398119) < 1e-15)
    assert(Benford.P.sliding(2).forall { case Seq(a, b) => a > b },
      "P(d) must decrease in d")
  }

  test("X155: digit extraction is exact and counts conserve") {
    val rows = Seq(("g", 1.7), ("g", 19.99), ("g", 123456.78),
      ("g", 9.01), ("g", 900000.0), ("g", 2.5))
      .toDF("grp", "v")
    val r = Benford.benfordOf(rows).collect()(0)
    assert(r.getAs[Long]("n") == 6L)
    assert(r.getAs[Long]("d1") == 3L) // 1.7, 19.99, 123456.78
    assert(r.getAs[Long]("d2") == 1L) // 2.5
    assert(r.getAs[Long]("d9") == 2L) // 9.01, 900000.0
    val total = (1 to 9).map(d => r.getAs[Long](s"d$d")).sum
    assert(total == 6L, "every row lands in exactly one digit bucket")
  }

  test("X155: sub-unit and negative values are excluded before counting") {
    // v < 1 has no leading digit 1–9: if such rows counted in n but in
    // no bucket, every expectation n·p(d) would inflate (advice item).
    // The guard must drop them from n, keeping n = Σ d1..d9 exactly.
    val rows = Seq(("g", 0.42), ("g", -7.0), ("g", 0.0), ("g", 1.7),
      ("g", 19.99), ("g", 9.01))
      .toDF("grp", "v")
    val r = Benford.benfordOf(rows).collect()(0)
    assert(r.getAs[Long]("n") == 3L,
      "rows with v < 1 must not count in n")
    val total = (1 to 9).map(d => r.getAs[Long](s"d$d")).sum
    assert(total == r.getAs[Long]("n"))
    // an all-excluded group emits no row at all (no digits to audit)
    val none = Benford.benfordOf(
      Seq(("z", 0.5), ("z", -3.0)).toDF("grp", "v")).collect()
    assert(none.isEmpty)
  }

  test("X155: log-uniform data passes, uniform data fails") {
    // log-uniform over [1, 10^6): exp of uniform — Benford-distributed
    // by construction (deterministic low-discrepancy sequence, no RNG)
    val n = 20000
    val logu = (0 until n).map(i =>
      ("lu", math.pow(10.0, 6.0 * ((i * 0.6180339887498949) % 1.0))))
    val unif = (0 until n).map(i => ("un", 100.0 + 800.0 * i / n))
    val out = Benford.benfordOf((logu ++ unif).toDF("grp", "v"))
      .collect().map(r => r.getString(0) -> r).toMap
    val chiLu = out("lu").getAs[Double]("chi2")
    val chiUn = out("un").getAs[Double]("chi2")
    // χ² critical value at 8 df, α=0.001 is 26.1 — the conforming
    // sample sits far below, the uniform sample orders of magnitude above
    assert(chiLu < 26.1, s"log-uniform sample must conform, χ²=$chiLu")
    assert(chiUn > 1000.0, s"uniform sample must fail hard, χ²=$chiUn")
    assert(out("lu").getAs[Double]("max_dev") <
      out("un").getAs[Double]("max_dev"))
  }

  test("X155: the registered query answers per priority class") {
    val rows = Benford.benfordAudit(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = (1 to 9).map(d => r.getAs[Long](s"d$d")).sum
      assert(total == r.getAs[Long]("n"))
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
  }

  test("X155: partition-count invariance") {
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderpriority".as("grp"), $"o_totalprice".as("v"))
    val one = Benford.benfordOf(o).collect().map(_.toString).toSeq
    val many = Benford.benfordOf(o.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
