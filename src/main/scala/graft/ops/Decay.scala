package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X90 — exponential-decay activity score: per-user engagement where
  * an event's contribution halves for every day of age at the
  * [[AsOfDay]] reference date, floored at [[MaxAge]] days — the
  * recency-weighted user signal behind freshness-aware sampling of
  * interaction data and churn screens (b50 integrates a VALUE over
  * time; x90 weights EVENTS by recency — different read, same
  * events.value column).
  *
  * Exactness — the half-life trick: weights are the integer
  * `2^(MaxAge − age)` (age clamped to [0, MaxAge]), so the decayed sum
  * is `Σ cents · 2^(MaxAge−age)` — pure i64 arithmetic (value is
  * 2-decimal in the testdata, so `round(value·100)` is an exact i64
  * cents figure; max contribution 2^10·10000 cents · corpus ≪ 2^63).
  * No float weight, no transcendental, no decimal cast: the one IEEE
  * step is the final division by the constant 100·2^MaxAge, identical
  * operands both engines. A float `exp(−λ·age)` weight would be the
  * b53-class divergence this construction exists to avoid.
  *
  * Scale shape: one row-local weight expression inside the scan
  * projection, then a single (user)-keyed two-phase aggregate with
  * map-side partials — the b09 shape; nothing downstream exceeds
  * |users| rows.
  */
object Decay {

  /** Reference "now" for age: the day after the generated January
    * corpus ends, so every event has age ≥ 1.
    */
  val AsOfDay = "2024-01-31"
  val MaxAge = 10

  def decayedActivity(spark: SparkSession, dir: String): DataFrame =
    decayedActivityOf(Tables.events(spark, dir))

  /** Core of X90 over any (user_id, value, ts) frame; test seam. */
  private[graft] def decayedActivityOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val age = datediff(lit(AsOfDay).cast("date"), $"ts".cast("date"))
    val shift = lit(MaxAge) - least(greatest(age, lit(0)), lit(MaxAge))
    events
      .select($"user_id",
        round($"value" * 100).cast("long").as("cents"), shift.as("sh"))
      // the DSL shiftleft wants a literal bit count; the SQL form takes
      // the per-row clamped-age column
      .withColumn("w", expr("shiftleft(cast(1 as bigint), sh)"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        sum($"cents" * $"w").as("score_i"))
      .select($"user_id", $"n_events", $"score_i",
        ($"score_i".cast("double")
          / lit(100.0 * (1L << MaxAge))).as("score_q"))
      .orderBy($"user_id")
  }

  val decayedActivitySql: String =
    s"""SELECT user_id,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)
      |         * (1::BIGINT << ($MaxAge - least(greatest(
      |             date_diff('day', CAST(ts AS DATE), DATE '$AsOfDay'),
      |             0), $MaxAge)))) AS BIGINT) AS score_i,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)
      |         * (1::BIGINT << ($MaxAge - least(greatest(
      |             date_diff('day', CAST(ts AS DATE), DATE '$AsOfDay'),
      |             0), $MaxAge)))) AS BIGINT)
      |         / (100.0 * ${1L << MaxAge}) AS score_q
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x90_decayed_activity" -> decayedActivity _)

  val oracles: Map[String, String] = Map(
    "x90_decayed_activity" -> decayedActivitySql)
}
