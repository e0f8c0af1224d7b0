package graft

import graft.ops.LaggedXcorr

/** X133 — lagged cross-correlation: a crafted lead-lag signal whose
  * peak sits exactly at the planted lag, the windowed-marginals
  * discipline (n shrinks with |lag|), self-correlation at lag 0 = 1,
  * and an exact integer replay on the real corpus.
  */
class LaggedXcorrSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("lag") ->
      ((r.getAs[Long]("n_days"), r.getAs[Long]("r_num"),
        r.getAs[Long]("sxx"), r.getAs[Long]("syy"),
        r.getAs[Double]("r_q")))).toMap

  private def eventsOf(rows: (String, String, Int)*) =
    rows.toSeq.flatMap { case (d, t, k) => Seq.fill(k)((d, t)) }
      .toDF("d", "event_type")
      .selectExpr("CAST(d AS TIMESTAMP) AS ts", "event_type")

  test("X133: a planted 2-day lead peaks exactly at lag +2") {
    // x (view) spikes on days 3 and 8; y (purchase) spikes on 5 and 10
    val e = eventsOf(
      ("2024-01-01", "view", 1), ("2024-01-03", "view", 9),
      ("2024-01-08", "view", 9), ("2024-01-10", "view", 1),
      ("2024-01-01", "purchase", 1), ("2024-01-05", "purchase", 9),
      ("2024-01-10", "purchase", 9))
    val out = rowsOf(LaggedXcorr.xcorrOf(e, "view", "purchase"))
    assert(out.size == 2 * LaggedXcorr.MaxLag + 1)
    val best = out.maxBy(_._2._5)
    assert(best._1 == 2L, s"peak at ${best._1}")
    // aligned window shrinks by |lag| over the 10-day spine
    assert(out(0L)._1 == 10L)
    assert(out(2L)._1 == 8L)
    assert(out(-3L)._1 == 7L)
  }

  test("X133: lag-0 self-correlation is exactly 1") {
    val e = eventsOf(
      ("2024-01-01", "view", 3), ("2024-01-02", "view", 7),
      ("2024-01-03", "view", 2))
    val out = rowsOf(LaggedXcorr.xcorrOf(e, "view", "view"))
    assert(out(0L)._5 == 1.0)
    assert(out(0L)._2 == out(0L)._3 && out(0L)._3 == out(0L)._4)
  }

  test("X133: real corpus equals the exact integer replay") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("CAST(ts AS DATE) AS day", "event_type").collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getString(1)))
    val d0 = events.map(_._1).min
    val d1 = events.map(_._1).max
    def series(t: String): Map[Long, Long] = {
      val c = events.filter(_._2 == t).groupBy(_._1)
        .view.mapValues(_.length.toLong).toMap
      (d0 to d1).map(d => d -> c.getOrElse(d, 0L)).toMap
    }
    val xs = series(LaggedXcorr.TypeX)
    val ys = series(LaggedXcorr.TypeY)
    val expected = (-LaggedXcorr.MaxLag to LaggedXcorr.MaxLag).map { l =>
      val pairs = (d0 to d1).flatMap { d =>
        val d2 = d + l
        if (d2 >= d0 && d2 <= d1) Some((xs(d), ys(d2))) else None
      }
      val n = pairs.length.toLong
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val num = n * pairs.map(p => p._1 * p._2).sum - sx * sy
      val sxx = n * pairs.map(p => p._1 * p._1).sum - sx * sx
      val syy = n * pairs.map(p => p._2 * p._2).sum - sy * sy
      l.toLong -> ((n, num, sxx, syy))
    }.toMap
    val got = rowsOf(LaggedXcorr.viewPurchaseXcorr(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (l, (n, num, sxx, syy, rq)) =>
      assert((n, num, sxx, syy) == expected(l), l)
      if (sxx > 0 && syy > 0)
        assert(rq == num.toDouble /
          math.sqrt(sxx.toDouble * syy.toDouble))
    }
  }
}
