package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X93 — session sequence assembly: each user session (X9's ≥30-minute
  * silence boundary) rendered as ONE ordered training sample — the
  * event-type sequence joined into a `>`-delimited string — plus its
  * size stats. This is the "conversation assembly" step of a
  * behavioral-data pipeline: raw event rows become the ordered
  * sequences a next-event/recommendation model actually trains on,
  * exactly as chat turns become dialogue transcripts.
  *
  * Determinism under distribution: `collect_list` order is
  * partition-arrival order (NOT deterministic), so the collected
  * elements carry their own (unix_micros, event_id) sort key and pass
  * through `array_sort` — canonical because the key is unique. Never
  * emit a collect_list-derived sequence without an in-array sort; that
  * is the classic silent nondeterminism at scale, pinned by the
  * shuffled-input test in SeqAssemblySpec.
  *
  * Scale shape: one window pass per user for the session boundary
  * (X9's shape), then a (user, session)-keyed aggregation whose state
  * is bounded by session length — the gap semantics bound it in wall
  * time, so no group collects an epoch. Partitioning is by user
  * throughout; no global anything except the oracle-determinism final
  * ORDER BY.
  *
  * Reference scope: the reference stores flattened per-event rows
  * (spark_processor.py:125-144) and never re-assembles order; this is
  * part of the mandated text/sequence extension set (SURVEY §2.5).
  */
object SeqAssembly {

  val GapUs = 1800000000L // 30 minutes, the X9 boundary

  def sessionSequences(spark: SparkSession, dir: String): DataFrame =
    sessionSequencesOf(Tables.events(spark, dir))

  /** Core over any (user_id, event_id, ts, event_type) frame; test seam. */
  private[graft] def sessionSequencesOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val byUser = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("us", unix_micros($"ts"))
      .withColumn("prev_us", lag($"us", 1).over(byUser))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"us" - $"prev_us" >= GapUs, 1L).otherwise(0L))
      .withColumn("session_id", sum($"new_sess").over(running))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct($"event_type").as("n_types"),
        array_sort(collect_list(struct($"us", $"event_id", $"event_type")))
          .as("ordered"))
      .select($"user_id", $"session_id", $"n_events", $"n_types",
        array_join(transform($"ordered", e => e.getField("event_type")), ">")
          .as("seq"))
      .orderBy($"user_id", $"session_id")
  }

  val sessionSequencesSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
       |  FROM events),
       |g AS (
       |  SELECT *, CASE WHEN lag(us) OVER w IS NULL
       |                   OR us - lag(us) OVER w >= $GapUs
       |                 THEN 1 ELSE 0 END AS new_sess
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT *, CAST(sum(new_sess) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS session_id
       |  FROM g)
       |SELECT user_id, session_id,
       |       count(*) AS n_events,
       |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
       |       string_agg(event_type, '>' ORDER BY ts, event_id) AS seq
       |FROM s
       |GROUP BY user_id, session_id
       |ORDER BY user_id, session_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x93_session_sequences" -> sessionSequences _)

  val oracles: Map[String, String] = Map(
    "x93_session_sequences" -> sessionSequencesSql)
}
