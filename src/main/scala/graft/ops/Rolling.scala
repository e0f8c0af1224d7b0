package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B43 — rolling 7-day distinct users: for every calendar day, the
  * number of DISTINCT users active in the trailing [[WindowDays]]-day
  * window — the DAU/WAU family metric, and the canonical "distinct
  * over a sliding window" problem.
  *
  * COUNT(DISTINCT) OVER a RANGE frame doesn't exist in Spark (and a
  * per-day re-scan of the trailing week is quadratic in window length).
  * The scalable rewrite: reduce events to the DISTINCT (user, day) set
  * once (map-side partials), then each (user, day) row CONTRIBUTES to
  * the [[WindowDays]] target days it falls inside — a row-local explode
  * of exactly WindowDays rows — and the per-target-day distinct-user
  * count is a two-phase aggregate. Fan-out is fixed at WindowDays
  * (never data-dependent), contributions are day-partitioned, and no
  * task ever holds a week of raw events. The mergeable-sketch variant
  * (per-day HLL sketches unioned across the frame) is the documented
  * swap when exact counts stop being worth their shuffle — b11 pins
  * that estimator's contract.
  *
  * Days outside the observed range (the first WindowDays−1 ramp-up
  * days) report the partial window honestly; target days with no
  * activity at all simply don't appear (they'd be zero rows — the b42
  * calendar densification composes on top if a gap-free axis is
  * needed).
  *
  * Parity: DATE arithmetic and i64 counts only.
  */
object Rolling {

  val WindowDays = 7

  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userDays = Tables.events(spark, dir)
      .select($"user_id", to_date($"ts").as("day"))
      .distinct()

    val maxDay = userDays.agg(max($"day").as("max_day"))

    userDays
      .select($"user_id", $"day",
        explode(expr(s"sequence(day, date_add(day, ${WindowDays - 1}))"))
          .as("target_day"))
      // don't emit contributions past the end of observed time — those
      // target days would report phantom partial windows
      .crossJoin(broadcast(maxDay))
      .filter($"target_day" <= $"max_day")
      .groupBy($"target_day")
      .agg(
        countDistinct($"user_id").as("active_users"),
        count(lit(1)).as("n_contributions"))
      .orderBy($"target_day")
  }

  val rollingDistinctSql: String =
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
       |mx AS (SELECT max(day) AS max_day FROM ud),
       |contrib AS (
       |  SELECT user_id, day,
       |         CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
       |           CAST(day AS TIMESTAMP) + INTERVAL ${WindowDays - 1} DAY,
       |           INTERVAL 1 DAY)) AS DATE) AS target_day
       |  FROM ud)
       |SELECT target_day,
       |       count(DISTINCT user_id) AS active_users,
       |       count(*) AS n_contributions
       |FROM contrib, mx
       |WHERE target_day <= max_day
       |GROUP BY target_day
       |ORDER BY target_day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b43_rolling_distinct" -> rollingDistinct _)

  val oracles: Map[String, String] = Map(
    "b43_rolling_distinct" -> rollingDistinctSql)
}
