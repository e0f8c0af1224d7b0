package graft

import graft.ops.InterArrival

/** X126 — cadence profile: a hand-computed gap series (lower median,
  * exact cv² pieces), the clockwork-bot signature (cv² = 0), the
  * single-event exclusion, sub-second truncation, and an exact
  * driver-side replay on the real corpus.
  */
class InterArrivalSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("user_id") ->
      ((r.getAs[Long]("n_gaps"), r.getAs[Long]("gap_min"),
        r.getAs[Long]("gap_med"), r.getAs[Long]("gap_max"),
        r.getAs[Long]("gap_sum"), r.getAs[Long]("s2_num"),
        r.getAs[Double]("cv2_q")))).toMap

  private def eventsOf(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "d", "event_id")
      .selectExpr("user_id", "CAST(d AS TIMESTAMP) AS ts", "event_id")

  test("X126: hand-computed gaps with an even count take the lower median") {
    // gaps (s): 10, 20, 40, 90 → lower median = rank (4+1) div 2 = 2 → 20
    // Σg=160, Σg²=10200 → s2_num = 4·10200 − 25600 = 15200
    val out = rowsOf(InterArrival.cadenceOf(eventsOf(
      (1L, "2024-01-01 00:00:00", 1L), (1L, "2024-01-01 00:00:10", 2L),
      (1L, "2024-01-01 00:00:30", 3L), (1L, "2024-01-01 00:01:10", 4L),
      (1L, "2024-01-01 00:02:40", 5L))))
    val (n, mn, med, mx, s, s2, cv2) = out(1L)
    assert((n, mn, med, mx, s, s2) == ((4L, 10L, 20L, 90L, 160L, 15200L)))
    assert(cv2 == (4.0 * 15200.0) / (3.0 * (160.0 * 160.0)))
  }

  test("X126: a clockwork bot has cv² exactly zero") {
    val out = rowsOf(InterArrival.cadenceOf(eventsOf(
      (7L, "2024-01-01 00:00:00", 1L), (7L, "2024-01-01 00:00:30", 2L),
      (7L, "2024-01-01 00:01:00", 3L), (7L, "2024-01-01 00:01:30", 4L))))
    val (n, mn, med, mx, _, s2, cv2) = out(7L)
    assert((n, mn, med, mx) == ((3L, 30L, 30L, 30L)))
    assert(s2 == 0L)
    assert(cv2 == 0.0)
  }

  test("X126: single-event users have no cadence row") {
    val out = rowsOf(InterArrival.cadenceOf(eventsOf(
      (1L, "2024-01-01 00:00:00", 1L),
      (2L, "2024-01-01 00:00:00", 2L), (2L, "2024-01-01 00:00:05", 3L))))
    assert(out.keySet == Set(2L))
  }

  test("X126: sub-second gaps truncate to whole seconds") {
    val out = rowsOf(InterArrival.cadenceOf(eventsOf(
      (1L, "2024-01-01 00:00:00.2", 1L), (1L, "2024-01-01 00:00:01.9", 2L),
      (1L, "2024-01-01 00:00:02.0", 3L))))
    // gaps: 1.7s → 1; 0.1s → 0
    val (n, mn, med, mx, s, _, _) = out(1L)
    assert((n, mn, med, mx, s) == ((2L, 0L, 0L, 1L, 1L)))
  }

  test("X126: real corpus equals the exact integer replay") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = events.groupBy(_._1).view
      .mapValues { es =>
        val sorted = es.sortBy(e => (e._2, e._3))
        sorted.zip(sorted.tail).map { case (a, b) =>
          Math.floorDiv(b._2 - a._2, 1000000L) } // non-negative: = div
      }
      .filter(_._2.nonEmpty)
      .mapValues { gs =>
        val n = gs.length.toLong
        val sorted = gs.sorted
        val med = sorted(((n + 1) / 2 - 1).toInt)
        val s = gs.sum
        val s2 = n * gs.map(g => g * g).sum - s * s
        (n, gs.min, med, gs.max, s, s2)
      }.toMap
    val got = rowsOf(InterArrival.cadenceProfile(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (u, (n, mn, med, mx, s, s2, cv2)) =>
      assert((n, mn, med, mx, s, s2) == expected(u), u)
      if (n > 1 && s > 0)
        assert(cv2 == (n.toDouble * s2.toDouble) /
          ((n - 1).toDouble * (s.toDouble * s.toDouble)))
    }
  }
}
