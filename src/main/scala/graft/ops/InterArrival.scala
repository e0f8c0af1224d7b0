package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X126 — exact inter-arrival cadence profile: the distribution of
  * second-granularity gaps between each user's consecutive events —
  * the bot-cadence fingerprint (scripted traffic fires on a clock:
  * tiny spread around a fixed gap; organic traffic is
  * exponential-ish). Completes the time axis of the activity family
  * at the EVENT grain: X124 measures day-level clumping, X126 the
  * within-day rhythm a daily rollup cannot see.
  *
  * Exactness — order statistics and moment fractions, never floats:
  * gaps are i64 seconds (µs difference `div` 10⁶ — truncating on
  * non-negatives, identical both engines); the median is the LOWER
  * median, the k = (n+1) div 2-th order statistic selected by a
  * (gap, arrival index) total order — an exact corpus value, not an
  * interpolation (the B51 robust-stats stance); the squared
  * coefficient of variation emits as cv² = n·s2_num/((n−1)·(Σg)²)
  * from the exact i64 pieces s2_num = n·Σg² − (Σg)², Σg (positive
  * gaps make Σg² ≤ (Σg)², so s2_num ≤ (Σg)² ≈ span² — i64-safe to
  * ~month-long user spans at second grain; the final ×n division
  * happens in DOUBLE, identical expression both engines). cv² < 1 is
  * sub-exponential regularity, ≈ 1 Poisson, > 1 clustered bursts.
  *
  * Scale shape: ONE per-user window sort produces the gap stream
  * (lag — partitioned, never global); the median selection rides a
  * second window on the SAME (user → gap) exchange; one user-keyed
  * aggregate each side, broadcast-joined. Nothing global but the
  * final ORDER BY.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X76/X94/X99/X112/X124 activity family).
  */
object InterArrival {

  def cadenceProfile(spark: SparkSession, dir: String): DataFrame =
    cadenceOf(Tables.events(spark, dir))

  /** Core of X126 over any (user_id, ts, event_id) frame; test seam. */
  private[graft] def cadenceOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val arrival = Window.partitionBy($"user_id")
      .orderBy($"us", $"event_id") // µs order ≡ ts order
    val gaps = events
      .select($"user_id", unix_micros($"ts").as("us"), $"event_id")
      .withColumn("prev", lag($"us", 1).over(arrival))
      .withColumn("i", row_number().over(arrival).cast("long"))
      .filter($"prev".isNotNull)
      .select($"user_id", $"i",
        expr("(us - prev) div 1000000").as("g"))
    val moments = gaps.groupBy($"user_id")
      .agg(count(lit(1)).as("n_gaps"),
        min($"g").as("gap_min"), max($"g").as("gap_max"),
        sum($"g").as("gap_sum"),
        (count(lit(1)) * sum($"g" * $"g") - sum($"g") * sum($"g"))
          .as("s2_num"))
    val med = gaps
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"g", $"i")))
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy($"user_id")))
      .filter(expr("rn = (cnt + 1) div 2"))
      .select($"user_id", $"g".as("gap_med"))
    moments.join(med, Seq("user_id"))
      .withColumn("cv2_q",
        when($"n_gaps" <= 1 || $"gap_sum" === 0, lit(0.0)).otherwise(
          ($"n_gaps".cast("double") * $"s2_num".cast("double")) /
            (($"n_gaps" - lit(1L)).cast("double") *
              ($"gap_sum".cast("double") * $"gap_sum".cast("double")))))
      .select($"user_id", $"n_gaps", $"gap_min", $"gap_med", $"gap_max",
        $"gap_sum", $"s2_num", $"cv2_q")
      .orderBy($"user_id")
  }

  val cadenceProfileSql: String =
    """WITH g AS (
      |  SELECT user_id,
      |         row_number() OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id) AS i,
      |         (epoch_us(ts) - lag(epoch_us(ts), 1) OVER (
      |            PARTITION BY user_id ORDER BY ts, event_id)) // 1000000
      |           AS g
      |  FROM events),
      |gaps AS (SELECT user_id, i, g FROM g WHERE g IS NOT NULL),
      |m AS (
      |  SELECT user_id, count(*) AS n_gaps, min(g) AS gap_min,
      |         max(g) AS gap_max, sum(g) AS gap_sum,
      |         count(*) * sum(g * g) - sum(g) * sum(g) AS s2_num
      |  FROM gaps GROUP BY user_id),
      |med AS (
      |  SELECT user_id, g AS gap_med
      |  FROM (SELECT user_id, g,
      |               row_number() OVER (PARTITION BY user_id
      |                 ORDER BY g, i) AS rn,
      |               count(*) OVER (PARTITION BY user_id) AS cnt
      |        FROM gaps)
      |  WHERE rn = (cnt + 1) // 2)
      |SELECT m.user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
      |       CAST(gap_min AS BIGINT) AS gap_min,
      |       CAST(gap_med AS BIGINT) AS gap_med,
      |       CAST(gap_max AS BIGINT) AS gap_max,
      |       CAST(gap_sum AS BIGINT) AS gap_sum,
      |       CAST(s2_num AS BIGINT) AS s2_num,
      |       CASE WHEN n_gaps <= 1 OR gap_sum = 0 THEN 0.0
      |            ELSE (CAST(n_gaps AS DOUBLE) * CAST(s2_num AS DOUBLE))
      |               / (CAST(n_gaps - 1 AS DOUBLE)
      |                    * (CAST(gap_sum AS DOUBLE)
      |                         * CAST(gap_sum AS DOUBLE))) END AS cv2_q
      |FROM m JOIN med ON m.user_id = med.user_id
      |ORDER BY m.user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x126_cadence_profile" -> cadenceProfile _)

  val oracles: Map[String, String] = Map(
    "x126_cadence_profile" -> cadenceProfileSql)
}
