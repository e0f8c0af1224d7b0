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
    * densified per-user daily series as b42, but gap days take
    * `v_prev + (v_next − v_prev)·(day − d_prev)/(d_next − d_prev)`
    * instead of a copy of the last value — the resample a smooth
    * consumer (rate estimation, charting, gradient features) wants
    * where b42's step function distorts. Both span endpoints are
    * observed by construction, so every gap has both neighbors.
    *
    * The per-day interpolated values are never materialized: by the
    * trapezoid identity, a gap of g days between observed cent values
    * qp and qn contributes Σₖ (qp + (qn−qp)·k/g) = (g−1)·(qp+qn)/2, so
    * the whole rollup reduces to one lag() over the OBSERVED days —
    * no calendar explode, no left join, one exchange on user_id.
    *
    * Parity: `value` is a 2-decimal quantity, so per-day cent totals
    * q = Σ round(100·value) are exact i64 in both engines (the rounded
    * doubles sit within 1e-10 of an integer — no .5-boundary risk);
    * gap contributions (g−1)·(qp+qn) stay in exact half-cent i64 units;
    * interp_total is ONE double division of identical i64 operands
    * (H / 200), bit-equal across engines at any magnitude — the b50
    * integer-space discipline, replacing the earlier DECIMAL(27,6) sum
    * of full-binary-precision interpolants whose HALF_UP rounding could
    * diverge on a ratio like 1/3 straddling the 6th-decimal boundary.
    */
  def resampleInterp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val daily = Tables.events(spark, dir)
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(sum(round($"value" * 100).cast("long")).as("q"))

    val ord = Window.partitionBy($"user_id").orderBy($"day")

    daily
      .withColumn("q_prev", lag($"q", 1).over(ord))
      .withColumn("d_prev", lag($"day", 1).over(ord))
      .groupBy($"user_id")
      .agg(
        min($"day").as("d0"),
        max($"day").as("d1"),
        count(lit(1)).as("n_obs"),
        (sum($"q" * 2) + sum(coalesce(
          (datediff($"day", $"d_prev") - 1) * ($"q_prev" + $"q"),
          lit(0L)))).as("half_cents"))
      .select(
        $"user_id",
        (datediff($"d1", $"d0") + 1).cast("long").as("n_days"),
        ((datediff($"d1", $"d0") + 1) - $"n_obs").cast("long")
          .as("n_interp_days"),
        ($"half_cents".cast("double") / 200.0).as("interp_total"))
      .orderBy($"user_id")
  }

  val resampleInterpSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day,
       |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS q
       |  FROM events GROUP BY 1, 2),
       |g AS (
       |  SELECT user_id, day, q,
       |         lag(q) OVER (PARTITION BY user_id ORDER BY day) AS q_prev,
       |         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS d_prev
       |  FROM daily)
       |SELECT user_id,
       |       CAST(max(day) - min(day) + 1 AS BIGINT) AS n_days,
       |       CAST(max(day) - min(day) + 1 - count(*) AS BIGINT)
       |         AS n_interp_days,
       |       CAST(CAST(sum(q * 2) + COALESCE(sum(
       |              (day - d_prev - 1) * (q_prev + q)), 0) AS BIGINT)
       |            AS DOUBLE) / 200.0 AS interp_total
       |FROM g
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b42_resample_ffill" -> resampleFfill _,
    "b53_resample_interp" -> resampleInterp _)

  val oracles: Map[String, String] = Map(
    "b42_resample_ffill" -> resampleFfillSql,
    "b53_resample_interp" -> resampleInterpSql)
}
