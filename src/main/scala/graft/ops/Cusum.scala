package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X94 — CUSUM drift detection per user over daily event counts: the
  * classic one-sided cumulative-sum control chart
  * `S_t = max(0, S_{t−1} + (cnt_t − K))`, flagging days where `S_t ≥ H`
  * — sustained above-allowance activity that a per-day threshold misses
  * (three days of +2 trips CUSUM; no single day trips a max filter).
  * The monitoring screen behind bot/abuse triage and data-drift alerts
  * on ingestion volumes.
  *
  * The distribution trick: the recursion is NOT window-expressible as
  * written, but the clamped form has a closed prefix identity —
  *
  *   `S_t = P_t − min(0, min_{j≤t} P_j)`,  `P_t = Σ_{i≤t} (cnt_i − K)`
  *
  * (induction: `max(0, P_t − m) = P_t − min(P_t, m)`), so two stacked
  * running windows per user compute the exact recursive chart with no
  * per-row iteration, no UDF, and no driver loop. The recursive
  * definition itself is replayed row-by-row in CusumSpec and pinned
  * equal — the identity is proven, not assumed. All arithmetic is i64
  * counts: nothing floats.
  *
  * Days with no events count 0 — the calendar spine is
  * `explode(sequence(start, end))` per user (the corpus span is a fixed
  * January window, asserted non-lossy in the spec), because CUSUM over
  * observed-days-only would silently skip the decay a silent day
  * contributes.
  *
  * Scale shape: one (user, day) count aggregation with map-side
  * partials, a users × 30 row spine (broadcast-sized per-user, keyed
  * join), two user-partitioned running windows, then a user-keyed
  * summary — partitioned by user end to end; nothing global but the
  * final ORDER BY.
  *
  * Reference scope: no monitoring ops in the reference; engine
  * extension (SURVEY §2.5, the X76/X90 activity family).
  */
object Cusum {

  val StartDay = "2024-01-01"
  val EndDay = "2024-01-30"
  /** Per-day allowance K (slack above which deviation accumulates) and
    * decision threshold H — tuned so the testdata flags a strict subset
    * of users (mean daily count ≈ 2.2 incl. silent days at every SF).
    */
  val K = 3
  val H = 5

  def cusumDrift(spark: SparkSession, dir: String): DataFrame =
    cusumDriftOf(Tables.events(spark, dir))

  /** Core over any (user_id, ts) frame; test seam. Emits one summary row
    * per user: totals, peak CUSUM, flagged-day census, first flag day.
    */
  private[graft] def cusumDriftOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    dailyChartOf(events)
      .groupBy($"user_id")
      .agg(
        sum($"cnt").as("total_events"),
        max($"cusum").as("max_cusum"),
        sum(when($"cusum" >= H, 1L).otherwise(0L)).as("n_flag_days"),
        min(when($"cusum" >= H, $"day")).as("first_flag_day"))
      .orderBy($"user_id")
  }

  /** The per-(user, day) chart underneath the summary — (user_id, day,
    * cnt, cusum) over the dense [[StartDay]]..[[EndDay]] spine; the
    * prefix-identity stage [[cusumDriftOf]] aggregates, exposed as the
    * parity target for the streaming X111 form (which maintains the
    * same chart by the direct recursion in keyed state).
    */
  private[graft] def dailyChartOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy($"user_id", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val spine = events.select($"user_id").distinct()
      .select($"user_id",
        explode(sequence(lit(StartDay).cast("date"), lit(EndDay).cast("date")))
          .as("day"))
    val run = Window.partitionBy($"user_id").orderBy($"day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("user_id", "day"), "left")
      .withColumn("cnt", coalesce($"cnt", lit(0L)))
      .withColumn("psum", sum($"cnt" - K).over(run))
      .withColumn("cusum", $"psum" - least(min($"psum").over(run), lit(0L)))
  }

  val cusumDriftSql: String =
    s"""WITH daily AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |spine AS (
       |  SELECT u.user_id, CAST(d.g AS DATE) AS day
       |  FROM (SELECT DISTINCT user_id FROM events) u
       |  CROSS JOIN (SELECT unnest(generate_series(
       |    DATE '$StartDay', DATE '$EndDay', INTERVAL 1 DAY)) AS g) d),
       |f AS (
       |  SELECT s.user_id, s.day, coalesce(dd.cnt, 0) AS cnt
       |  FROM spine s LEFT JOIN daily dd
       |    ON s.user_id = dd.user_id AND s.day = dd.day),
       |p AS (
       |  SELECT *, CAST(sum(cnt - $K) OVER w AS BIGINT) AS psum
       |  FROM f
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |c AS (
       |  SELECT *, psum - least(CAST(min(psum) OVER w AS BIGINT), 0) AS cusum
       |  FROM p
       |  WINDOW w AS (PARTITION BY user_id ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT user_id,
       |       CAST(sum(cnt) AS BIGINT) AS total_events,
       |       CAST(max(cusum) AS BIGINT) AS max_cusum,
       |       CAST(sum(CASE WHEN cusum >= $H THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_flag_days,
       |       min(CASE WHEN cusum >= $H THEN day END) AS first_flag_day
       |FROM c
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x94_cusum_drift" -> cusumDrift _)

  val oracles: Map[String, String] = Map(
    "x94_cusum_drift" -> cusumDriftSql)
}
