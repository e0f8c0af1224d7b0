package graft

import graft.ops.Dispersion

/** X124 — exact dispersion: constant ⇒ steady (D = 0), a bursty hand
  * case, the exact Poisson boundary, the one-day degenerate, and an
  * exact driver-side replay on the real corpus (including the silent-
  * day spine semantics).
  */
class DispersionSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("n_days"), r.getAs[Long]("total_events"),
        r.getAs[Long]("disp_num"), r.getAs[Long]("disp_den"),
        r.getAs[Double]("disp_q"), r.getAs[String]("profile")))).toMap

  private def eventsOf(rows: (Long, String)*) =
    rows.toSeq.toDF("user_id", "d")
      .selectExpr("user_id", "CAST(d AS TIMESTAMP) AS ts")

  test("X124: constant series is steady with D = 0 exactly") {
    val out = rowsOf(Dispersion.dispersionOf(eventsOf(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-01 11:00:00"),
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-02 11:00:00"),
      (1L, "2024-01-03 10:00:00"), (1L, "2024-01-03 11:00:00"))))
    // y = (2,2,2): num = 3·12 − 36 = 0, den = 2·6 = 12
    assert(out(1L) == ((3L, 6L, 0L, 12L, 0.0, "steady")))
  }

  test("X124: bursty series counts silent days in the spine") {
    // y = (6,0,1): num = 3·37 − 49 = 62, den = 2·7 = 14 → D = 31/7
    val out = rowsOf(Dispersion.dispersionOf(eventsOf(
      Seq.fill(6)((1L, "2024-01-01 09:00:00")) :+
        ((1L, "2024-01-03 09:00:00")): _*)))
    assert(out(1L) == ((3L, 7L, 62L, 14L, 62.0 / 14.0, "bursty")))
  }

  test("X124: the Poisson boundary is an exact integer tie") {
    // y = (2,0,1): num = 3·5 − 9 = 6, den = 2·3 = 6 → D = 1
    val out = rowsOf(Dispersion.dispersionOf(eventsOf(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-03 09:00:00"))))
    assert(out(1L) == ((3L, 3L, 6L, 6L, 1.0, "poisson")))
  }

  test("X124: a one-day user has no dispersion evidence") {
    val out = rowsOf(Dispersion.dispersionOf(eventsOf(
      (1L, "2024-01-01 09:00:00"), (1L, "2024-01-01 10:00:00"))))
    assert(out(1L)._4 == 0L)
    assert(out(1L)._6 == "no-evidence")
  }

  test("X124: real corpus equals the exact integer replay") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "CAST(ts AS DATE) AS day").collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val expected = events.groupBy(_._1).view.mapValues { es =>
      val byDay = es.groupBy(_._2).view.mapValues(_.length.toLong)
      val d0 = es.map(_._2).min(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
      val d1 = es.map(_._2).max(Ordering.by((d: java.time.LocalDate) =>
        d.toEpochDay))
      val ys = (d0.toEpochDay to d1.toEpochDay)
        .map(d => byDay.getOrElse(java.time.LocalDate.ofEpochDay(d), 0L))
      val n = ys.length.toLong
      val s = ys.sum
      val s2 = ys.map(y => y * y).sum
      (n, s, n * s2 - s * s, (n - 1) * s)
    }.toMap
    val got = rowsOf(Dispersion.activityDispersion(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, tot, num, den, q, prof)) =>
      assert((n, tot, num, den) == expected(u), u)
      if (den > 0) assert(q == num.toDouble / den.toDouble)
      assert(prof == (if (den == 0) "no-evidence"
        else if (num > den) "bursty"
        else if (num < den) "steady" else "poisson"))
    }
  }
}
