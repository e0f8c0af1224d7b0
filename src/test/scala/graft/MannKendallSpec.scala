package graft

import java.sql.Timestamp

import graft.ops.MannKendall

/** X171 — Mann–Kendall + Sen: exact S on hand series (strictly
  * monotone = ±C(n,2), constant = 0 with full tie mass), the Sen
  * median against a robust-to-outlier reading OLS would miss, the
  * tie-corrected variance identity, and an independent corpus replay.
  */
class MannKendallSpec extends SparkSpec {

  import spark.implicits._

  /** (type, day-index, count) fixture → an events-shaped frame with
    * `count` rows on each active day (day 0 = 2024-01-01). */
  private def eventsOf(rows: (String, Int, Int)*) =
    rows.flatMap { case (t, d, c) =>
      (0 until c).map(_ => (t,
        Timestamp.valueOf(f"2024-01-${d + 1}%02d 12:00:00")))
    }.toDF("event_type", "ts")

  private def byType(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("event_type") -> r).toMap

  test("X171: strictly increasing series reads S = +C(n,2), no ties") {
    // counts 1,2,3,4,5 over 5 days: every pair concordant
    val out = byType(MannKendall.mkOf(
      eventsOf((1 to 5).map(d => ("up", d - 1, d)): _*)))
    val r = out("up")
    assert(r.getAs[Long]("s_stat") == 10L)
    assert(r.getAs[Long]("n_days") == 5L)
    // no value ties: var18 = n(n−1)(2n+5) = 5·4·15 = 300
    assert(r.getAs[Long]("var18") == 300L)
    assert(r.getAs[Double]("sen_slope") == 1.0,
      "every pairwise slope of 1,2,3,4,5 is exactly 1")
  }

  test("X171: constant series reads S = 0 with full tie mass") {
    val out = byType(MannKendall.mkOf(
      eventsOf((1 to 4).map(d => ("flat", d - 1, 7)): _*)))
    val r = out("flat")
    assert(r.getAs[Long]("s_stat") == 0L)
    // one tie group of t = 4: var18 = 4·3·13 − 4·3·13 = 0
    assert(r.getAs[Long]("var18") == 0L)
    assert(r.getAs[Double]("sen_slope") == 0.0)
  }

  test("X171: Sen's slope shrugs off the outlier burst OLS chases") {
    // steady 5,6,7,8,9 with day 2 spiked to 900: most pairwise slopes
    // stay near 1, so the MEDIAN stays near 1 while the mean would not
    val out = byType(MannKendall.mkOf(eventsOf(
      ("bursty", 0, 5), ("bursty", 1, 6), ("bursty", 2, 900),
      ("bursty", 3, 8), ("bursty", 4, 9))))
    val sen = out("bursty").getAs[Double]("sen_slope")
    assert(sen >= 0.5 && sen <= 2.0,
      s"robust slope must ignore the burst, got $sen")
  }

  test("X171: silent days enter the series as zeros (the X99 spine)") {
    // active on days 0 and 4 only ⇒ n_days = 5 with three 0-count days
    val out = byType(MannKendall.mkOf(eventsOf(
      ("gappy", 0, 3), ("gappy", 4, 3))))
    val r = out("gappy")
    assert(r.getAs[Long]("n_days") == 5L)
    assert(r.getAs[Long]("total_events") == 6L)
    // series 3,0,0,0,3: S = sum of signs — pairs (3,0)×3 = −3,
    // (3,3) = 0, (0,0)×3 = 0, (0,3)×3 = +3 ⇒ S = 0
    assert(r.getAs[Long]("s_stat") == 0L)
  }

  test("X171: real corpus equals an independent pairwise replay") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("event_type", "CAST(ts AS DATE) AS day")
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val expected = rows.groupBy(_._1).view.mapValues { ds =>
      val d0 = ds.map(_._2).min
      val d1 = ds.map(_._2).max
      val byDay = ds.map(d => d._2 -> d._3).toMap
      val ys = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1))
        .map(d => byDay.getOrElse(d, 0L)).toVector
      val n = ys.length.toLong
      val s = (for {
        i <- ys.indices; j <- (i + 1) until ys.length
      } yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      val tie18 = ys.groupBy(identity).values
        .map(g => { val t = g.length.toLong; t * (t - 1) * (2 * t + 5) })
        .sum
      (n, ys.sum, s, n * (n - 1) * (2 * n + 5) - tie18)
    }.toMap
    val got = MannKendall.mannKendall(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
          r.getAs[Long]("s_stat"), r.getAs[Long]("var18")))).toMap
    assert(got == expected)
  }

  test("X171: partition-count invariance") {
    val e = Tables.events(spark, sfDir)
    val one = MannKendall.mkOf(e).collect().map(_.toString).toSeq
    val many = MannKendall.mkOf(e.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
