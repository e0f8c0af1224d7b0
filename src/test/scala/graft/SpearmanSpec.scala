package graft

import graft.ops.Spearman

/** X116 — grouped Spearman: perfect monotone ±1, tie handling vs a
  * hand computation, constant-column degenerate, and an exact
  * driver-side doubled-rank replay on the real corpus.
  */
class SpearmanSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("rho_num"),
        r.getAs[Long]("sxx"), r.getAs[Long]("syy"),
        r.getAs[Double]("rho")))).toMap

  private def frame(rows: (String, Long, Long, Long)*) =
    rows.toSeq.toDF("grp", "doc_id", "x", "y")

  test("X116: strictly monotone gives exactly +1, reversed gives -1") {
    val up = rowsOf(Spearman.spearmanOf(frame(
      ("g", 1L, 10L, 100L), ("g", 2L, 20L, 300L), ("g", 3L, 30L, 900L))))
    assert(up("g")._5 == 1.0)
    assert(up("g")._2 == up("g")._3 && up("g")._3 == up("g")._4)
    val down = rowsOf(Spearman.spearmanOf(frame(
      ("g", 1L, 10L, 900L), ("g", 2L, 20L, 300L), ("g", 3L, 30L, 100L))))
    assert(down("g")._5 == -1.0)
  }

  test("X116: tie handling matches the averaged-rank hand computation") {
    // x = (1,1,2), y = (5,7,7): doubled ranks u = (3,3,6) wait —
    // rank() min-ranks: x ties at rank 1 (c=2) → u = 2*1+2-1 = 3,3; x=2
    // rank 3 (c=1) → u = 6. y=5 rank 1 (c=1) → v = 2; y=7 rank 2 (c=2)
    // → v = 2*2+2-1 = 5,5.
    // n=3: Σu=12 Σv=12 Σuv=3*2+3*5+6*5=51 Σu²=54 Σv²=54
    // num = 3*51-144 = 9; sxx = 3*54-144 = 18; syy = 18 → rho = 0.5
    val out = rowsOf(Spearman.spearmanOf(frame(
      ("g", 1L, 1L, 5L), ("g", 2L, 1L, 7L), ("g", 3L, 2L, 7L))))
    assert(out("g") == ((3L, 9L, 18L, 18L, 0.5)))
  }

  test("X116: a constant column defines rho = 0") {
    val out = rowsOf(Spearman.spearmanOf(frame(
      ("g", 1L, 4L, 1L), ("g", 2L, 4L, 2L), ("g", 3L, 4L, 3L))))
    assert(out("g")._3 == 0L) // sxx = 0
    assert(out("g")._5 == 0.0)
  }

  test("X116: groups rank independently") {
    val out = rowsOf(Spearman.spearmanOf(frame(
      ("g", 1L, 1L, 1L), ("g", 2L, 2L, 2L),
      ("h", 1L, 1L, 2L), ("h", 2L, 2L, 1L))))
    assert(out("g")._5 == 1.0)
    assert(out("h")._5 == -1.0)
  }

  test("X116: real corpus equals the exact doubled-rank replay") {
    def doubledRanks(xs: Seq[Long]): Map[Long, Long] = {
      val sorted = xs.sorted
      // doubled average rank per value: 2*(minRank) + c - 1
      sorted.distinct.map { v =>
        val before = sorted.count(_ < v).toLong
        val c = sorted.count(_ == v).toLong
        v -> (2L * (before + 1L) + c - 1L)
      }.toMap
    }
    val rows = Spearman.lengthBreadthSpearman(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).collect().map { r =>
      val words = r.getAs[String]("text").toLowerCase
        .split("\\s+").filter(_.nonEmpty).distinct.length.toLong
      (r.getAs[String]("source"), r.getAs[Long]("n_chars"), words)
    }
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      val n = ds.length.toLong
      val ux = doubledRanks(ds.map(_._2).toSeq)
      val vy = doubledRanks(ds.map(_._3).toSeq)
      val uv = ds.map(d => (ux(d._2), vy(d._3)))
      val (su, sv) = (uv.map(_._1).sum, uv.map(_._2).sum)
      val num = n * uv.map(p => p._1 * p._2).sum - su * sv
      val sxx = n * uv.map(p => p._1 * p._1).sum - su * su
      val syy = n * uv.map(p => p._2 * p._2).sum - sv * sv
      (n, num, sxx, syy)
    }.toMap
    val got = rowsOf(rows)
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, (n, num, sxx, syy, rho)) =>
      assert((n, num, sxx, syy) == expected(g), g)
      if (sxx > 0 && syy > 0)
        assert(rho == num.toDouble /
          math.sqrt(sxx.toDouble * syy.toDouble))
    }
  }
}
