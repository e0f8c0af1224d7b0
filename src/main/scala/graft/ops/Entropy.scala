package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X164 — per-user behavioral entropy: the Shannon entropy of each
  * user's event-type distribution (H = −Σ_t p_t·ln p_t, in nats) with
  * event and type counts — the diversity screen interaction-data
  * curation runs next to X126's cadence profile (WHEN a user acts) and
  * X93's sequences (in what ORDER): H ≈ 0 flags single-action bots and
  * stuck clients, H ≈ ln(|types|) flags uniform scripted sweeps;
  * organic users sit between. Entropy-based user screens are the
  * classical anti-spam feature the events table exists to exercise.
  *
  * Exactness: type counts are exact i64 from ONE (user, type)
  * map-side-combined aggregate; each entropy term −(c/n)·ln(c/n) is a
  * double of identical exact operands with the one libm call absorbed
  * by i64 quantization at 1e9 (floor — the x155/x163 discipline; ln's
  * cross-engine ulp scales to ~1e-7 of the floor granularity), and the
  * per-user sum over its type rows is then EXACT integer addition in
  * any order — no float sum across a variable row set anywhere. One
  * division back to nats at the end. A single-type user is exactly 0.
  *
  * Scale shape: the (user, type) aggregate is map-side combined and
  * keyed by the user — types-bounded rows per user; the per-user fold
  * is a second aggregate on the SAME user key (no new exchange after
  * the first); |users| output rows.
  *
  * Reference scope: the reference has no per-entity analytics; engine
  * extension (SURVEY §2.5, the X9/X93/X126 behavioral family).
  */
object Entropy {

  def userEntropy(spark: SparkSession, dir: String): DataFrame =
    entropyOf(Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")))

  /** Core of X164 over any (user_id, event_type) frame; test seam. */
  private[graft] def entropyOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val cnt = events.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("c"))
    val byUser = cnt.groupBy($"user_id")
      .agg(sum($"c").as("n_events"), count(lit(1)).as("n_types"),
        collect_list(struct($"event_type", $"c")).as("tc"))
    // quantized per-type terms summed exactly: p = c/n over identical
    // exact operands; ln absorbed by the 1e9 floor; single-type ⇒ 0
    byUser
      .withColumn("h_q", expr(
        "aggregate(tc, 0L, (acc, x) -> acc + CAST(floor(" +
          "-(CAST(x.c AS DOUBLE) / CAST(n_events AS DOUBLE)) * " +
          "ln(CAST(x.c AS DOUBLE) / CAST(n_events AS DOUBLE)) * 1e9) " +
          "AS BIGINT))"))
      .select($"user_id", $"n_events", $"n_types",
        when($"n_types" === 1L, lit(0.0))
          .otherwise($"h_q".cast("double") / 1e9).as("entropy_nats"))
      .orderBy($"user_id")
  }

  val userEntropySql: String = {
    val p = "(CAST(cnt.c AS DOUBLE) / CAST(nn.n_events AS DOUBLE))"
    s"""WITH cnt AS (
       |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
       |  FROM events GROUP BY 1, 2),
       |nn AS (
       |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events
       |  FROM cnt GROUP BY 1),
       |u AS (
       |  SELECT cnt.user_id, max(nn.n_events) AS n_events,
       |         CAST(count(*) AS BIGINT) AS n_types,
       |         CAST(sum(CAST(floor(-$p * ln($p) * 1e9) AS BIGINT))
       |           AS BIGINT) AS h_q
       |  FROM cnt JOIN nn ON cnt.user_id = nn.user_id
       |  GROUP BY cnt.user_id)
       |SELECT user_id, n_events, n_types,
       |       CASE WHEN n_types = 1 THEN 0.0
       |            ELSE CAST(h_q AS DOUBLE) / 1e9 END AS entropy_nats
       |FROM u
       |ORDER BY user_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x164_user_entropy" -> userEntropy _)

  val oracles: Map[String, String] = Map(
    "x164_user_entropy" -> userEntropySql)
}
