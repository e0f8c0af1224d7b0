package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** B49 — partition-skew audit: simulate hash-partitioning the events
  * fact on its natural join key (user_id) into P buckets and report
  * each bucket's load plus its skew ratio against the uniform ideal —
  * the diagnosis that decides when a join needs b28's salting or AQE's
  * skew split, produced BEFORE running the join rather than from its
  * straggler post-mortem. Complements x37 (value-level heavy hitters)
  * with the bucket-level view the shuffle actually experiences: a hot
  * KEY only hurts if its BUCKET overflows.
  *
  * The bucket function is the engine-portable md5Long40 mod P (a
  * stand-in with the same distributional behavior as Spark's internal
  * Murmur3 — which DuckDB could not replay); the audit itself is one
  * two-phase count aggregate (map-side partials collapse rows to ≤ P
  * per task) plus a one-row broadcast of the total — never a global
  * window. At 100 TB: scan + tiny shuffle + P rows.
  *
  * Parity: counts exact i64; `share`/`skew_ratio` are single IEEE
  * divisions of identical integers (skew_ratio = n·P/total, the
  * bucket's load relative to uniform).
  */
object SkewAudit {

  private[graft] val nBuckets = 32

  def partitionSkew(spark: SparkSession, dir: String): DataFrame =
    partitionSkewOf(Tables.events(spark, dir))

  /** Core of B49 over any events-shaped frame (ScaleBench seam). */
  private[graft] def partitionSkewOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events
      .select(
        (Hashing.md5Long40(concat(lit("pb|"), $"user_id".cast("string")))
          % nBuckets).as("bucket"))

    val counts = ev.groupBy($"bucket").agg(count(lit(1)).as("n_rows"))
    val total = counts.agg(sum($"n_rows").as("total"))
    counts.crossJoin(broadcast(total))
      .select($"bucket", $"n_rows",
        ($"n_rows".cast("double") / $"total".cast("double")).as("share"),
        (($"n_rows" * nBuckets).cast("double") / $"total".cast("double"))
          .as("skew_ratio"))
      .orderBy($"bucket")
  }

  val partitionSkewSql: String = {
    val bucket = s"${Hashing.sqlMd5Long40(
      "'pb|' || CAST(user_id AS VARCHAR)")} % $nBuckets"
    s"""WITH counts AS (
       |  SELECT $bucket AS bucket, count(*) AS n_rows
       |  FROM events GROUP BY 1
       |), t AS (SELECT CAST(sum(n_rows) AS BIGINT) AS total FROM counts)
       |SELECT bucket, n_rows,
       |       CAST(n_rows AS DOUBLE) / CAST(total AS DOUBLE) AS share,
       |       CAST(n_rows * $nBuckets AS DOUBLE) / CAST(total AS DOUBLE)
       |         AS skew_ratio
       |FROM counts CROSS JOIN t
       |ORDER BY bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b49_partition_skew" -> partitionSkew _)

  val oracles: Map[String, String] = Map(
    "b49_partition_skew" -> partitionSkewSql)
}
