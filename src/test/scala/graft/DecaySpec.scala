package graft

import java.sql.Timestamp

import graft.ops.Decay

/** X90 — decayed activity: crafted half-life fixture with hand-computed
  * integer scores, and an exact driver-side replay on the real events.
  */
class DecaySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("X90: weights halve per day and clamp at MaxAge") {
    val events = Seq(
      // age 1 -> weight 2^9; age 2 -> 2^8; age 30 -> clamp 2^0
      (1L, 1.00, ts("2024-01-30 12:00:00")),
      (1L, 1.00, ts("2024-01-29 12:00:00")),
      (2L, 2.50, ts("2024-01-01 00:00:00")))
      .toDF("user_id", "value", "ts")
    val got = Decay.decayedActivityOf(events).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("score_i"),
          r.getAs[Double]("score_q"))))
      .toMap
    assert(got(1L) == ((2L, 100L * 512 + 100L * 256,
      (100.0 * 512 + 100 * 256) / (100.0 * 1024))))
    assert(got(2L) == ((1L, 250L, 250.0 / 102400.0)))
  }

  test("X90: real events equal the exact integer replay") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "value", "cast(ts as date) as d").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[java.sql.Date](2).toLocalDate))
    val asOf = java.time.LocalDate.parse(Decay.AsOfDay)
    val expected = rows.groupBy(_._1).view.mapValues { es =>
      val score = es.map { case (_, v, d) =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, asOf)
        val shift = Decay.MaxAge -
          math.min(math.max(age, 0L), Decay.MaxAge.toLong)
        math.round(v * 100) * (1L << shift)
      }.sum
      (es.length.toLong, score)
    }.toMap
    val got = Decay.decayedActivity(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Long]("n_events"), r.getAs[Long]("score_i"))))
      .toMap
    assert(got == expected)
  }
}
