package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** B47 — small-file compaction plan: group a partition's many small
  * files into target-sized output bins, preserving time order — the
  * planning half of the lakehouse OPTIMIZE/compaction maintenance job
  * (the execution half is a partitioned rewrite of each bin). The
  * "file inventory" here is derived from events as one (event_type,
  * day) file per partition per day with its real byte size; in a lake
  * it comes from the table's transaction log — metadata cardinality
  * (files), never data rows, which is what makes the plan cheap at
  * 100 TB: a billion-file table is a ~10 GB inventory.
  *
  * The packing is greedy first-fit in day order: running byte offset
  * per partition, `bin = start_offset div target`. Day order is load-
  * bearing — bins stay CONTIGUOUS time ranges, so the compacted files
  * keep tight min/max day footers and stat-based day pruning keeps
  * working (a size-sorted bin-pack would be marginally fuller but
  * scrambles time locality). The running sum windows over the
  * PARTITION key (event_type) — per-partition state, no global
  * funnel, embarrassingly parallel across a real table's partitions.
  *
  * Parity: bytes/rows exact i64 (Spark octet_length ≡ DuckDB strlen —
  * both UTF-8 byte counts); `div`/`//` agree on nonnegative integral
  * division; day ranges are DATE min/max.
  */
object Compaction {

  /** Target output size per compacted bin (bytes). 64 KiB keeps the
    * derived inventory multi-bin at test SF; a real lake uses ~1 GiB —
    * the plan shape is scale-free. */
  private[graft] val targetBytes = 65536L

  def compactionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val files = Tables.events(spark, dir)
      .groupBy($"event_type", to_date($"ts").as("file_day"))
      .agg(sum(octet_length($"props")).as("f_bytes"),
        count(lit(1)).as("f_rows"))

    val w = Window.partitionBy($"event_type").orderBy($"file_day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files
      .withColumn("cum_bytes", sum($"f_bytes").over(w))
      .withColumn("bin_id",
        expr(s"(cum_bytes - f_bytes) div $targetBytes"))
      .groupBy($"event_type", $"bin_id")
      .agg(count(lit(1)).as("n_files"),
        sum($"f_bytes").as("bin_bytes"),
        sum($"f_rows").as("bin_rows"),
        min($"file_day").as("first_day"),
        max($"file_day").as("last_day"))
      .orderBy($"event_type", $"bin_id")
  }

  val compactionPlanSql: String =
    s"""WITH files AS (
       |  SELECT event_type, CAST(ts AS DATE) AS file_day,
       |         CAST(sum(strlen(props)) AS BIGINT) AS f_bytes,
       |         count(*) AS f_rows
       |  FROM events GROUP BY 1, 2
       |), packed AS (
       |  SELECT event_type, file_day, f_bytes, f_rows,
       |         sum(f_bytes) OVER (PARTITION BY event_type
       |           ORDER BY file_day
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |           AS cum_bytes
       |  FROM files
       |)
       |SELECT event_type,
       |       CAST((cum_bytes - f_bytes) // $targetBytes AS BIGINT) AS bin_id,
       |       count(*) AS n_files,
       |       CAST(sum(f_bytes) AS BIGINT) AS bin_bytes,
       |       CAST(sum(f_rows) AS BIGINT) AS bin_rows,
       |       min(file_day) AS first_day, max(file_day) AS last_day
       |FROM packed
       |GROUP BY 1, 2
       |ORDER BY event_type, bin_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b47_compaction_plan" -> compactionPlan _)

  val oracles: Map[String, String] = Map(
    "b47_compaction_plan" -> compactionPlanSql)
}
