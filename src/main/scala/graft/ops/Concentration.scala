package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X112 — behavioral concentration profile: per user, how concentrated
  * the event-type distribution is — the diversity screen behind bot /
  * scripted-traffic triage and interaction-data curation (a user whose
  * events are 98% one type carries almost no behavioral signal; X94
  * flags VOLUME drift, X99 fits volume TREND, X112 measures
  * distributional COLLAPSE). Shannon entropy needs logs (the
  * b53-class float divergence), so the op emits the two
  * standard exactly-computable concentration measures:
  *
  *  - collision probability (Rényi-2): P(two random events share a
  *    type) = Σc²/n² — the exact fraction `coll_num = Σc²`,
  *    `coll_den = n²` (1 = fully scripted, 1/k = uniform over k);
  *  - min-entropy operands: max p = max(c)/n as (`max_cnt`, n) — the
  *    most conservative entropy bound, −log₂(max p), is a consumer-side
  *    log over exact operands.
  *
  * Both are i64 fractions plus ONE IEEE division each (the b50/X99/
  * X106 discipline). Σc² stays far from overflow at any per-user
  * volume the events table can hold (c ≤ n ≤ 2³¹ ⇒ Σc² < 2⁶²).
  *
  * Scale shape: one (user, type) count aggregation (map-side combined)
  * then one user-keyed rollup of squares/max — the b09 two-phase shape,
  * state bounded by |users|·|types|. No window, no join, nothing global
  * but the final ORDER BY.
  *
  * Reference scope: no profiling ops in the reference; engine extension
  * (SURVEY §2.5, the X76/X90/X94/X99 activity family).
  */
object Concentration {

  def typeConcentration(spark: SparkSession, dir: String): DataFrame =
    concentrationOf(Tables.events(spark, dir))

  /** Core of X112 over any (user_id, event_type) frame; test seam. */
  private[graft] def concentrationOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("c"))
      .groupBy($"user_id")
      .agg(sum($"c").as("n_events"),
        count(lit(1)).as("n_types"),
        max($"c").as("max_cnt"),
        sum($"c" * $"c").as("coll_num"))
      .select($"user_id", $"n_events", $"n_types", $"max_cnt", $"coll_num",
        ($"n_events" * $"n_events").as("coll_den"),
        ($"coll_num".cast("double") /
          ($"n_events" * $"n_events").cast("double")).as("coll_q"),
        ($"max_cnt".cast("double") / $"n_events".cast("double")).as("maxp_q"))
      .orderBy($"user_id")
  }

  val typeConcentrationSql: String =
    """WITH c AS (
      |  SELECT user_id, event_type, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |a AS (
      |  SELECT user_id,
      |         sum(c) AS n_events,
      |         count(*) AS n_types,
      |         max(c) AS max_cnt,
      |         sum(c * c) AS coll_num
      |  FROM c GROUP BY user_id)
      |SELECT user_id,
      |       CAST(n_events AS BIGINT) AS n_events,
      |       CAST(n_types AS BIGINT) AS n_types,
      |       CAST(max_cnt AS BIGINT) AS max_cnt,
      |       CAST(coll_num AS BIGINT) AS coll_num,
      |       CAST(n_events * n_events AS BIGINT) AS coll_den,
      |       CAST(coll_num AS DOUBLE)
      |         / CAST(n_events * n_events AS DOUBLE) AS coll_q,
      |       CAST(max_cnt AS DOUBLE) / CAST(n_events AS DOUBLE) AS maxp_q
      |FROM a
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x112_type_concentration" -> typeConcentration _)

  val oracles: Map[String, String] = Map(
    "x112_type_concentration" -> typeConcentrationSql)
}
