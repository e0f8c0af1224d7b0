package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X124 — exact per-user activity dispersion (Fano factor / index of
  * dispersion): sample variance over mean of the dense daily count
  * series — the burstiness screen that separates steady accounts
  * (D < 1, sub-Poisson), Poisson-like organic traffic (D ≈ 1), and
  * bursty/scripted activity (D ≫ 1). Completes the activity triptych:
  * X99 fits the DIRECTION of drift, X112 measures concentration across
  * event TYPES, X124 measures clumping across TIME — a bot can be flat
  * in trend and diverse in type yet still fire in bursts.
  *
  * Exactness — one exact fraction per user (the X99 discipline): over
  * the n-day active span with daily counts y (silent days explicit 0
  * via the shared [[Trend.denseDailyOf]] spine),
  *
  *   D = s²/ȳ = (n·Σy² − (Σy)²) / ((n−1)·Σy)
  *
  * — `disp_num`/`disp_den` as i64 (n ≤ 31 days here, counts corpus-
  * bounded: n·Σy² ≤ n·(Σy)² — i64-safe to ~5·10⁸ events per user-
  * month), ONE IEEE division; n = 1 or Σy = 0 give den = 0 and define
  * D = 0 (a one-day user has no dispersion evidence). The Poisson
  * boundary is an integer comparison: bursty ⇔ num > den.
  *
  * Scale shape: identical to X99 — a (user, day) count aggregate with
  * map-side partials, the per-user span aggregate, the keyed spine
  * join, ONE user-keyed sum aggregate; partitioned by user end to end,
  * no window. Nothing global but the final ORDER BY.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X76/X94/X99/X112 activity family).
  */
object Dispersion {

  def activityDispersion(spark: SparkSession, dir: String): DataFrame =
    dispersionOf(Tables.events(spark, dir))

  /** Core of X124 over any (user_id, ts) frame; test seam. */
  private[graft] def dispersionOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    Trend.denseDailyOf(events)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"),
        sum($"y").as("total_events"),
        (count(lit(1)) * sum($"y" * $"y") - sum($"y") * sum($"y"))
          .as("disp_num"),
        ((count(lit(1)) - lit(1L)) * sum($"y")).as("disp_den"))
      .withColumn("disp_q",
        when($"disp_den" === 0, lit(0.0)).otherwise(
          $"disp_num".cast("double") / $"disp_den".cast("double")))
      .withColumn("profile",
        when($"disp_den" === 0, "no-evidence")
          .when($"disp_num" > $"disp_den", "bursty")
          .when($"disp_num" < $"disp_den", "steady")
          .otherwise("poisson"))
      .orderBy($"user_id")
  }

  val activityDispersionSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1
      |  FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT s.user_id, CAST(g.g AS DATE) AS day
      |  FROM span s,
      |       LATERAL (SELECT unnest(generate_series(
      |         s.d0, s.d1, INTERVAL 1 DAY)) AS g) g),
      |xy AS (
      |  SELECT s.user_id, coalesce(d.cnt, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |    ON s.user_id = d.user_id AND s.day = d.day),
      |a AS (
      |  SELECT user_id, count(*) AS n_days, sum(y) AS total_events,
      |         count(*) * sum(y * y) - sum(y) * sum(y) AS disp_num,
      |         (count(*) - 1) * sum(y) AS disp_den
      |  FROM xy GROUP BY user_id)
      |SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
      |       CAST(total_events AS BIGINT) AS total_events,
      |       CAST(disp_num AS BIGINT) AS disp_num,
      |       CAST(disp_den AS BIGINT) AS disp_den,
      |       CASE WHEN disp_den = 0 THEN 0.0
      |            ELSE CAST(disp_num AS DOUBLE)
      |                   / CAST(disp_den AS DOUBLE) END AS disp_q,
      |       CASE WHEN disp_den = 0 THEN 'no-evidence'
      |            WHEN disp_num > disp_den THEN 'bursty'
      |            WHEN disp_num < disp_den THEN 'steady'
      |            ELSE 'poisson' END AS profile
      |FROM a
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x124_activity_dispersion" -> activityDispersion _)

  val oracles: Map[String, String] = Map(
    "x124_activity_dispersion" -> activityDispersionSql)
}
