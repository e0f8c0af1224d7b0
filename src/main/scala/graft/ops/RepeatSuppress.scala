package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.{dsum, sqlSum}

/** B44 — rapid-repeat suppression: an event is a REPEAT when the same
  * (user, event_type) fired within the preceding [[WindowUs]] (1 hour)
  * — the telemetry/CDC debounce every ingestion front-end applies
  * (retry storms, double-clicks, at-least-once producers) before events
  * count as facts.
  *
  * One LAG over the (user, event_type)-partitioned window ordered by
  * (µs, event_id) — a single keyed exchange, the b36/b37 shape; the
  * (µs, event_id) tie-break makes the lag total-ordered, so
  * equal-timestamp events deterministically suppress the higher id.
  * Note the contract: the window is measured from the PREVIOUS EVENT
  * (debounce semantics — a steady drip of sub-hour repeats suppresses
  * indefinitely), not from the last KEPT event; the session-gap variant
  * of the same plan is x09's sessionization.
  *
  * Parity: exact i64 µs differences, i64 counts, decimal-exact kept
  * value sums.
  */
object RepeatSuppress {

  /** 1 hour in microseconds. */
  val WindowUs: Long = 3600L * 1000000

  def repeatSuppress(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"us", $"event_id")
    Tables.events(spark, dir)
      .select($"event_id", $"user_id", $"event_type", $"value",
        unix_micros($"ts").as("us"))
      .withColumn("prev_us", lag($"us", 1).over(w))
      .withColumn("is_repeat",
        $"prev_us".isNotNull && ($"us" - $"prev_us") <= WindowUs)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when($"is_repeat", 1L).otherwise(0L)).as("n_suppressed"),
        dsum(when(!$"is_repeat", $"value")).as("kept_value_sum"))
      .withColumn("suppress_rate",
        $"n_suppressed".cast("double") / $"n_events".cast("double"))
      .orderBy($"event_type")
  }

  val repeatSuppressSql: String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, value,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |lagged AS (
       |  SELECT event_type, value,
       |         lag(us) OVER (PARTITION BY user_id, event_type
       |                       ORDER BY us, event_id) AS prev_us,
       |         us
       |  FROM e),
       |flagged AS (
       |  SELECT event_type, value,
       |         (prev_us IS NOT NULL AND us - prev_us <= $WindowUs)
       |           AS is_repeat
       |  FROM lagged)
       |SELECT event_type,
       |       count(*) AS n_events,
       |       CAST(sum(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_suppressed,
       |       ${sqlSum("CASE WHEN NOT is_repeat THEN value END")}
       |         AS kept_value_sum,
       |       CAST(sum(CASE WHEN is_repeat THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(count(*) AS DOUBLE) AS suppress_rate
       |FROM flagged
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b44_repeat_suppress" -> repeatSuppress _)

  val oracles: Map[String, String] = Map(
    "b44_repeat_suppress" -> repeatSuppressSql)
}
