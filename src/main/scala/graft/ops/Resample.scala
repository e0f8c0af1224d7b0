package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.{dsum, sqlSum}

/** B42 — time-series resampling with forward fill: densify each user's
  * daily spend series onto a gap-free calendar between their first and
  * last active day, forward-fill missing days with the last observed
  * value (LAST_VALUE IGNORE NULLS over the per-user ordered window),
  * and roll up per-user gap/total stats — the resample step every
  * downstream time-series consumer (charting, feature windows, as-of
  * training labels) assumes has already happened.
  *
  * Scale shape: everything is keyed by user — the daily aggregate
  * (map-side partials on (user, day)), the per-user span aggregate, the
  * calendar explode (row-local `sequence(d0, d1)`, fan-out bounded by
  * the covered day range), the calendar↔daily join, and the fill
  * window all reuse the user partitioning; no global window, no
  * broadcast needed (users scale with data). Gap days are bounded by
  * span length, so the explode cannot blow up on a hot user beyond the
  * calendar itself.
  *
  * Parity: daily sums are decimal-exact (dsum), the forward fill COPIES
  * those doubles (no new arithmetic), the final rollup re-sums copies
  * through decimal again, and day arithmetic is exact DATE math. The
  * first calendar day is observed by construction (d0 = min observed),
  * so the fill never reads an empty frame.
  */
object Resample {

  def resampleFfill(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(dsum($"value").as("spend"))

    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(expr("sequence(d0, d1)")).as("day"))

    val w = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("filled", last($"spend", ignoreNulls = true).over(w))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_days"),
        sum(when($"spend".isNull, 1L).otherwise(0L)).as("n_gap_days"),
        max(when($"spend".isNull, $"day")).as("last_gap_day"),
        dsum($"filled").as("filled_total"))
      .orderBy($"user_id")
  }

  val resampleFfillSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |         ${sqlSum("value")} AS spend
       |  FROM events GROUP BY 1, 2),
       |cal AS (
       |  SELECT user_id,
       |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
       |        FROM daily GROUP BY 1)),
       |f AS (
       |  SELECT c.user_id, c.day, d.spend,
       |         last_value(d.spend IGNORE NULLS) OVER (
       |           PARTITION BY c.user_id ORDER BY c.day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
       |  FROM cal c LEFT JOIN daily d
       |    ON c.user_id = d.user_id AND c.day = d.day)
       |SELECT user_id,
       |       count(*) AS n_days,
       |       CAST(sum(CASE WHEN spend IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_gap_days,
       |       max(CASE WHEN spend IS NULL THEN day END) AS last_gap_day,
       |       ${sqlSum("filled")} AS filled_total
       |FROM f
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** B53 — time-series resampling with LINEAR interpolation: the same
    * densified per-user calendar as b42, but gap days take
    * `v_prev + (v_next − v_prev)·(day − d_prev)/(d_next − d_prev)`
    * instead of a copy of the last value — the resample a smooth
    * consumer (rate estimation, charting, gradient features) wants
    * where b42's step function distorts. Both span endpoints are
    * observed by construction, so every gap day has both neighbors.
    *
    * Scale shape: identical to b42 — everything keyed by user; the two
    * neighbor lookups are IGNORE-NULLS first/last over the SAME
    * user-partitioned day order (one exchange feeds both frames).
    *
    * Parity: neighbor values are decimal-exact daily sums COPIED into
    * both engines' window output; day distances are exact DATE-integer
    * math; the interpolation is the identical fixed-order IEEE
    * expression on identical operands (int/int division in double,
    * multiply, add) — bit-exact, no rounding guard.
    */
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(dsum($"value").as("spend"))

    val cal = daily.groupBy($"user_id")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
      .select($"user_id", explode(expr("sequence(d0, d1)")).as("day"))

    val ord = Window.partitionBy($"user_id").orderBy($"day")
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    cal.join(daily, Seq("user_id", "day"), "left")
      .withColumn("v_prev", last($"spend", ignoreNulls = true).over(back))
      .withColumn("d_prev",
        last(when($"spend".isNotNull, $"day"), ignoreNulls = true).over(back))
      .withColumn("v_next", first($"spend", ignoreNulls = true).over(fwd))
      .withColumn("d_next",
        first(when($"spend".isNotNull, $"day"), ignoreNulls = true).over(fwd))
      .withColumn("interp",
        when($"spend".isNotNull, $"spend")
          .otherwise($"v_prev" + ($"v_next" - $"v_prev")
            * (datediff($"day", $"d_prev").cast("double")
              / datediff($"d_next", $"d_prev").cast("double"))))
      .groupBy($"user_id")
      .agg(
        count(lit(1)).as("n_days"),
        sum(when($"spend".isNull, 1L).otherwise(0L)).as("n_interp_days"),
        dsum($"interp").as("interp_total"))
      .orderBy($"user_id")
  }

  val resampleInterpSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |         ${sqlSum("value")} AS spend
       |  FROM events GROUP BY 1, 2),
       |cal AS (
       |  SELECT user_id,
       |         CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
       |           CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM (SELECT user_id, min(day) AS d0, max(day) AS d1
       |        FROM daily GROUP BY 1)),
       |f AS (
       |  SELECT c.user_id, c.day, d.spend,
       |         last_value(d.spend IGNORE NULLS) OVER wb AS v_prev,
       |         last_value(CASE WHEN d.spend IS NOT NULL THEN c.day END
       |           IGNORE NULLS) OVER wb AS d_prev,
       |         first_value(d.spend IGNORE NULLS) OVER wf AS v_next,
       |         first_value(CASE WHEN d.spend IS NOT NULL THEN c.day END
       |           IGNORE NULLS) OVER wf AS d_next
       |  FROM cal c LEFT JOIN daily d
       |    ON c.user_id = d.user_id AND c.day = d.day
       |  WINDOW wb AS (PARTITION BY c.user_id ORDER BY c.day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
       |         wf AS (PARTITION BY c.user_id ORDER BY c.day
       |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       |i AS (
       |  SELECT user_id, day, spend,
       |         CASE WHEN spend IS NOT NULL THEN spend
       |              ELSE v_prev + (v_next - v_prev)
       |                   * (CAST(day - d_prev AS DOUBLE)
       |                      / CAST(d_next - d_prev AS DOUBLE))
       |         END AS interp
       |  FROM f)
       |SELECT user_id,
       |       count(*) AS n_days,
       |       CAST(sum(CASE WHEN spend IS NULL THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_interp_days,
       |       ${sqlSum("interp")} AS interp_total
       |FROM i
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b42_resample_ffill" -> resampleFfill _,
    "b53_resample_interp" -> resampleInterp _)

  val oracles: Map[String, String] = Map(
    "b42_resample_ffill" -> resampleFfillSql,
    "b53_resample_interp" -> resampleInterpSql)
}
