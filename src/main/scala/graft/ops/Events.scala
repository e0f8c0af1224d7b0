package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, MapType, StringType}

import graft.Tables
import graft.functions.OracleSafe._

/** Batch analytics over the `events` table — the reference's analytical
  * core (tumbling event-time window + avg/max/stddev aggregates,
  * `/root/reference/Processing&Storing/spark_processor.py:147-165`)
  * re-expressed as declarative DataFrame plans, plus the event-stream
  * extensions (sliding windows, JSON props decode, gap sessionization).
  *
  * Scale notes: every query here is a single hash-aggregate or window over
  * a partition-pruned parquet scan; the groupBy keys (window bucket,
  * event_type, user_id) are high-cardinality enough to parallelize across
  * 1000 executors and all aggregation is map-side partial first.
  */
object Events {

  /** Flagship — the reference's windowed aggregation as a batch query:
    * 5-minute tumbling event-time windows × event_type with avg/max/stddev
    * (mirrors `spark_processor.py:150-165`; window op R19, aggs R20-R22).
    */
  def windowAgg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(window($"ts", "5 minutes").as("w"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        davg($"value").as("avg_value"),
        max($"value").as("max_value"),
        round(stddev_samp($"value"), 4).as("stddev_value"))
      .select(
        // NTZ so the dumped parquet carries the same logical type DuckDB
        // produces for naive timestamps (session TZ is UTC, so no shift)
        $"w.start".cast("timestamp_ntz").as("window_start"),
        $"event_type", $"n_events", $"avg_value", $"max_value",
        $"stddev_value")
      .orderBy($"window_start", $"event_type")
  }

  private[graft] val windowAggSql: String =
    """SELECT CAST(time_bucket(INTERVAL 5 MINUTE, ts) AS TIMESTAMP) AS window_start,
      |       event_type,
      |       count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / count(value) AS avg_value,
      |       max(value) AS max_value,
      |       round(stddev_samp(value), 4) AS stddev_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin
}
