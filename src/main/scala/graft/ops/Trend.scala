package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X99 — exact per-user activity trend: the least-squares slope of
  * daily event counts over each user's own active span (first to last
  * active day, silent days counted as 0), kept EXACT by never dividing
  * — the engagement-drift screen behind ramp-up/churn triage and the
  * per-source volume-trend audit of an ingestion feed (X94 flags
  * sustained deviation from a fixed allowance; X99 fits the direction
  * and steepness of the drift itself).
  *
  * Exactness — emit the fraction, not the quotient: with x = day index
  * (0-based, per-user) and y = daily count, the fitted slope is
  *
  *   (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)
  *
  * Both sides are small-integer sums (n ≤ 31 days here; counts are
  * corpus-bounded), so the op outputs `slope_num`/`slope_den` as i64
  * and the trend class as `sign(slope_num)` — no IEEE division, no
  * regr_slope float path, bit-equal at any scale. Consumers that want
  * the float divide the two columns themselves (one exact-operand
  * division, the X90/b53 discipline). n = 1 degenerates to 0/0 and
  * classes as `flat` (x₀ = 0 forces num = 0).
  *
  * Dense-span semantics: a user active on Jan 3 and Jan 9 only has
  * seven observations (two non-zero), not two — observed-days-only
  * would fit a line through activity bursts and miss the decay between
  * them (the X94 silent-day lesson). The spine is per-user
  * `explode(sequence(first_day, last_day))`.
  *
  * Scale shape: one (user, day) count aggregation with map-side
  * partials, a per-user span aggregate (two dates), the keyed spine
  * join, then ONE user-keyed sum-of-products aggregate — partitioned
  * by user end to end; no window at all (the prefix structure CUSUM
  * needs is absent here: Σxy/Σx² are plain sums). Nothing global but
  * the final ORDER BY.
  *
  * Reference scope: no trend ops in the reference; engine extension
  * (SURVEY §2.5, the X76/X90/X94 activity family).
  */
object Trend {

  def activityTrend(spark: SparkSession, dir: String): DataFrame =
    activityTrendOf(Tables.events(spark, dir))

  /** Core over any (user_id, ts) frame; test seam. One row per user:
    * span length, total events, exact slope fraction, trend class.
    */
  /** Dense per-user daily series over each user's active span (silent
    * days as explicit 0 rows — the X94/X99 spine semantics): one row
    * per (user_id, day index x, count y). Shared by X99's slope fit
    * and X124's dispersion.
    */
  private[graft] def denseDailyOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
    val spine = span.select($"user_id", $"d0",
      explode(sequence($"d0", $"d1")).as("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select($"user_id",
        datediff($"day", $"d0").cast("long").as("x"),
        coalesce($"cnt", lit(0L)).as("y"))
  }

  private[graft] def activityTrendOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    denseDailyOf(events)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_days"),
        sum($"y").as("total_events"),
        (count(lit(1)) * sum($"x" * $"y") - sum($"x") * sum($"y"))
          .as("slope_num"),
        (count(lit(1)) * sum($"x" * $"x") - sum($"x") * sum($"x"))
          .as("slope_den"))
      .withColumn("trend",
        when($"slope_num" > 0, "up")
          .when($"slope_num" < 0, "down").otherwise("flat"))
      .orderBy($"user_id")
  }

  val activityTrendSql: String =
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT user_id, min(day) AS d0, max(day) AS d1
      |  FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT s.user_id, s.d0, CAST(g.g AS DATE) AS day
      |  FROM span s,
      |       LATERAL (SELECT unnest(generate_series(
      |         s.d0, s.d1, INTERVAL 1 DAY)) AS g) g),
      |xy AS (
      |  SELECT s.user_id,
      |         date_diff('day', s.d0, s.day) AS x,
      |         coalesce(d.cnt, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |    ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id,
      |       CAST(count(*) AS BIGINT) AS n_days,
      |       CAST(sum(y) AS BIGINT) AS total_events,
      |       CAST(count(*) * sum(x * y) - sum(x) * sum(y) AS BIGINT)
      |         AS slope_num,
      |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
      |         AS slope_den,
      |       CASE WHEN count(*) * sum(x * y) - sum(x) * sum(y) > 0 THEN 'up'
      |            WHEN count(*) * sum(x * y) - sum(x) * sum(y) < 0 THEN 'down'
      |            ELSE 'flat' END AS trend
      |FROM xy
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x99_activity_trend" -> activityTrend _)

  val oracles: Map[String, String] = Map(
    "x99_activity_trend" -> activityTrendSql)
}
