package graft

import java.sql.Timestamp

import graft.ops.Trend

/** X99 — activity trend: hand-fitted slope fixtures (rising, falling,
  * single-day, silent-gap) and an exact driver-side replay on the real
  * events.
  */
class TrendSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
        r.getAs[Long]("slope_num"), r.getAs[Long]("slope_den"),
        r.getAs[String]("trend")))).toMap

  test("X99: rising counts fit a positive exact slope") {
    // user 1: y = (1, 2, 3) on x = (0, 1, 2):
    //   n=3 Sx=3 Sy=6 Sxy=0+2+6=8 Sxx=5
    //   num = 3*8-3*6 = 6; den = 3*5-9 = 6  (slope exactly 1)
    val events = (Seq.fill(1)(ts("2024-01-01 08:00:00")) ++
      Seq.fill(2)(ts("2024-01-02 08:00:00")) ++
      Seq.fill(3)(ts("2024-01-03 08:00:00")))
      .map((1L, _)).toDF("user_id", "ts")
    assert(rowsOf(Trend.activityTrendOf(events)) ==
      Map(1L -> ((3L, 6L, 6L, 6L, "up"))))
  }

  test("X99: a silent gap day joins the fit as zero") {
    // user 2: active Jan 1 (2 events) and Jan 3 (1) — span is THREE
    // days, y = (2, 0, 1): n=3 Sx=3 Sy=3 Sxy=0+0+2=2 Sxx=5
    //   num = 3*2-3*3 = -3; den = 6  (declining despite the comeback)
    val events = (Seq.fill(2)(ts("2024-01-01 00:00:00")) ++
      Seq.fill(1)(ts("2024-01-03 23:59:59")))
      .map((2L, _)).toDF("user_id", "ts")
    assert(rowsOf(Trend.activityTrendOf(events)) ==
      Map(2L -> ((3L, 3L, -3L, 6L, "down"))))
  }

  test("X99: a single active day degenerates to flat 0/0") {
    val events = Seq.fill(4)((3L, ts("2024-01-10 12:00:00")))
      .toDF("user_id", "ts")
    assert(rowsOf(Trend.activityTrendOf(events)) ==
      Map(3L -> ((1L, 4L, 0L, 0L, "flat"))))
  }

  test("X99: real events equal the exact integer replay") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "cast(ts as date) as d").collect()
      .map(r => (r.getLong(0), r.getAs[java.sql.Date](1).toLocalDate))
    val expected = rows.groupBy(_._1).view.mapValues { es =>
      val byDay = es.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val d0 = byDay.keys.min
      val d1 = byDay.keys.max
      val xy = Iterator.iterate(d0)(_.plusDays(1)).takeWhile(!_.isAfter(d1))
        .map(d => (java.time.temporal.ChronoUnit.DAYS.between(d0, d),
          byDay.getOrElse(d, 0L))).toSeq
      val n = xy.size.toLong
      val sx = xy.map(_._1).sum
      val sy = xy.map(_._2).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val num = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      val trend = if (num > 0) "up" else if (num < 0) "down" else "flat"
      (n, sy, num, den, trend)
    }.toMap
    assert(rowsOf(Trend.activityTrend(spark, sfDir)) == expected)
  }
}
