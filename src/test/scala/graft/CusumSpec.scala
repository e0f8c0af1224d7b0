package graft

import java.sql.Timestamp

import graft.ops.Cusum

/** X94 — CUSUM drift: hand-computed chart fixtures, the corpus-span
  * precondition, and the recursive-definition replay that proves the
  * prefix-minus-running-min identity the distributed form relies on.
  */
class CusumSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, h: Int = 12): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")

  /** n events for (user, day) spread over distinct hours. */
  private def burst(uid: Long, day: Int, n: Int): Seq[(Long, Timestamp)] =
    (0 until n).map(i => (uid, ts(day, 1 + i % 20)))

  test("X94: hand-computed chart — accumulation, clamp at zero, threshold") {
    // user 1 daily counts: Jan1=5, Jan4=5, Jan5=5 → d=+2,-3,-3,+2,+2,…
    // S: 2,0,0,2,4 then decays to 0; never reaches H=5 → no flags
    // user 2: Jan1=6, Jan2=6 → S: 3,6 → flag on Jan 2, peak 6
    val events = (burst(1L, 1, 5) ++ burst(1L, 4, 5) ++ burst(1L, 5, 5) ++
      burst(2L, 1, 6) ++ burst(2L, 2, 6)).toDF("user_id", "ts")
    val got = Cusum.cusumDriftOf(events)
      .selectExpr("user_id", "total_events", "max_cusum", "n_flag_days",
        "cast(first_flag_day as string)")
      .as[(Long, Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((15L, 4L, 0L, None)))
    assert(got(2L) == ((12L, 6L, 1L, Some("2024-01-02"))))
  }

  test("X94: silent days decay the chart (calendar spine is dense)") {
    // 6 events on Jan 10 → S=3 that day; by Jan 12 the −3/day allowance
    // has clamped it back to 0, so the peak is exactly 3
    val events = burst(3L, 10, 6).toDF("user_id", "ts")
    val got = Cusum.cusumDriftOf(events)
      .selectExpr("user_id", "max_cusum", "n_flag_days")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((3L, 3L, 0L)))
  }

  test("X94: corpus span precondition — every event inside the spine window") {
    val (lo, hi) = Tables.events(spark, sfDir)
      .selectExpr("cast(min(cast(ts as date)) as string)",
        "cast(max(cast(ts as date)) as string)")
      .as[(String, String)].head()
    assert(lo >= Cusum.StartDay && hi <= Cusum.EndDay,
      s"events span [$lo, $hi] outside the fixed spine " +
        s"[${Cusum.StartDay}, ${Cusum.EndDay}]")
  }

  test("X94: real events equal the RECURSIVE chart replayed per user") {
    val daily = Tables.events(spark, sfDir)
      .groupBy($"user_id", org.apache.spark.sql.functions.to_date($"ts").as("d"))
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("cnt"))
      .selectExpr("user_id", "cast(d as string)", "cnt")
      .as[(Long, String, Long)].collect()
    val start = java.time.LocalDate.parse(Cusum.StartDay)
    val nDays = java.time.temporal.ChronoUnit.DAYS
      .between(start, java.time.LocalDate.parse(Cusum.EndDay)).toInt + 1
    val expected = daily.groupBy(_._1).view.mapValues { rows =>
      val byDay = rows.map(r => java.time.temporal.ChronoUnit.DAYS
        .between(start, java.time.LocalDate.parse(r._2)).toInt -> r._3).toMap
      var s = 0L
      var maxS = 0L
      var nFlag = 0L
      var first: Option[String] = None
      (0 until nDays).foreach { i =>
        val cnt = byDay.getOrElse(i, 0L)
        s = math.max(0L, s + (cnt - Cusum.K)) // the recursive definition
        maxS = math.max(maxS, s)
        if (s >= Cusum.H) {
          nFlag += 1
          if (first.isEmpty) first = Some(start.plusDays(i).toString)
        }
      }
      (rows.map(_._3).sum, maxS, nFlag, first)
    }.toMap
    val got = Cusum.cusumDrift(spark, sfDir)
      .selectExpr("user_id", "total_events", "max_cusum", "n_flag_days",
        "cast(first_flag_day as string)")
      .as[(Long, Long, Long, Long, Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expected)
  }
}
