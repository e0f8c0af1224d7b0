package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X86 — incremental aggregate maintenance: refresh a per-key metrics
  * table (count / exact total / mean / max per (user, event_type)) by
  * MERGING stored partial aggregates of the base corpus with partials
  * of a new batch — never rescanning the base. The x78 pattern (merge
  * beats recompute) applied to the metrics layer: at 100 TB the base
  * partials are a persisted key-sized artifact, a day's delta costs
  * |delta| + |touched keys|, and the full-history scan disappears from
  * the refresh path entirely. `origin` tags each output key
  * base_only / delta_only / merged — the audit column an incremental
  * pipeline reads to see what a batch actually touched.
  *
  * The DuckDB oracle IS the from-scratch recompute over the whole
  * events table (origin derived from conditional counts) — so the
  * hash gate doesn't just check engine parity, it PROVES the
  * merge-of-partials is lossless: count and decimal totals are exact
  * i64/decimal sums (associative by construction — the reason partial
  * aggregation composes at all), max composes as max-of-maxes, and the
  * mean is ONE IEEE division of the same exact operands on both
  * paths. `value` is 2-decimal in the testdata so DECIMAL(27,6)
  * partials are exact (the OracleSafe precondition).
  *
  * Plan shape: the base/delta split is one predicate on the scan (at
  * production scale the base partials load from parquet instead —
  * same frame, zero scan); each partials pass is a standard two-phase
  * hash aggregate; the merge is a key-keyed aggregate over the UNION
  * of two key-sized frames. No window, no join, no driver state.
  */
object IncrementalAgg {

  /** Batch boundary: the last week of the generated January corpus. */
  val Cutoff = "2024-01-24 00:00:00"

  def incrementalAgg(spark: SparkSession, dir: String): DataFrame =
    incrementalAggOf(Tables.events(spark, dir),
      to_timestamp(lit(Cutoff)))

  /** The per-key partial-aggregate definition — THE shared contract
    * between the batch merge (X86) and the streaming state (X88,
    * stream/StreamMetrics.scala): both paths aggregate exactly these
    * columns, so the "state == the persisted base partials" claim is
    * structural, not a copy.
    */
  private[graft] def partialsOf(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("cnt"),
        sum($"value".cast("decimal(27,6)")).as("tot"),
        max($"value").as("mx"))
  }

  /** Core of X86 over any (user_id, event_type, value, ts) frame;
    * test seam — crafted fixtures pin merge-vs-recompute equality.
    */
  private[graft] def incrementalAggOf(events: DataFrame, cutoff: Column): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val base = partialsOf(events.filter($"ts" < cutoff))
      .withColumn("nb", lit(1L)).withColumn("nd", lit(0L))
    // a NULL ts fails both `< cutoff` and `>= cutoff`; route it to the
    // delta side explicitly so no row silently vanishes — matching the
    // oracle, whose FILTER counts classify a null-ts row as delta_only
    val delta = partialsOf(events.filter($"ts" >= cutoff || $"ts".isNull))
      .withColumn("nb", lit(0L)).withColumn("nd", lit(1L))
    base.unionByName(delta)
      .groupBy($"user_id", $"event_type")
      .agg(sum($"cnt").as("n_events"), sum($"tot").as("tot"),
        max($"mx").as("max_value"),
        sum($"nb").as("has_base"), sum($"nd").as("has_delta"))
      .select($"user_id", $"event_type", $"n_events",
        $"tot".cast("double").as("total_q"),
        ($"tot".cast("double") / $"n_events".cast("double")).as("avg_q"),
        $"max_value",
        when($"has_base" > 0 && $"has_delta" > 0, "merged")
          .when($"has_base" > 0, "base_only")
          .otherwise("delta_only").as("origin"))
      .orderBy($"user_id", $"event_type")
  }

  /** Full recompute — deliberately NOT the merge shape (see scaladoc). */
  val incrementalAggSql: String =
    s"""SELECT user_id, event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) AS total_q,
      |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE)
      |         / CAST(count(*) AS DOUBLE) AS avg_q,
      |       max(value) AS max_value,
      |       CASE WHEN count(*) FILTER (WHERE ts < TIMESTAMP '$Cutoff') > 0
      |                 AND count(*) FILTER (WHERE ts >= TIMESTAMP '$Cutoff') > 0
      |            THEN 'merged'
      |            WHEN count(*) FILTER (WHERE ts < TIMESTAMP '$Cutoff') > 0
      |            THEN 'base_only' ELSE 'delta_only' END AS origin
      |FROM events
      |GROUP BY user_id, event_type
      |ORDER BY user_id, event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x86_incremental_agg" -> incrementalAgg _)

  val oracles: Map[String, String] = Map(
    "x86_incremental_agg" -> incrementalAggSql)
}
