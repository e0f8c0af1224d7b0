package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe.{dsum, sqlSum}

/** X55 — winsorized (clipped) robust statistics: per-event-type p05/p95
  * fences, every value clamped into the fence, then exact clipped
  * aggregates — the outlier-robust feature normalization a training
  * pipeline applies before a numeric column feeds a model (plain mean /
  * stddev are unbounded-influence statistics; one corrupt 1e12 reading
  * poisons the whole feature).
  *
  * Two-pass shape, both passes partition-parallel: (1) the x34
  * order-statistic aggregate computes PERCENTILE_DISC fences per group
  * (exact existing doubles → bit-identical cross-engine; the
  * approx_percentile swap at open scale is documented at x34); (2) the
  * fences broadcast back onto the events scan (|event_types| rows — a
  * map-side hash join, no second shuffle of the fact), each row clamps
  * via least/greatest, and the clipped sum goes through the
  * decimal-exact dsum so the re-aggregate is order-independent. Clip
  * counts are exact i64.
  *
  * Parity: fences are order statistics (bit-identical), clamp is
  * least/greatest on identical doubles, sums are decimal-exact, and
  * clip-count comparisons use the same strict `<`/`>` on both engines.
  */
object Winsorize {

  val Lo = 0.05
  val Hi = 0.95

  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).select($"event_type", $"value")

    val fences = ev.groupBy($"event_type")
      .agg(
        expr(s"percentile_disc($Lo) WITHIN GROUP (ORDER BY value)").as("lo"),
        expr(s"percentile_disc($Hi) WITHIN GROUP (ORDER BY value)").as("hi"))

    ev.join(broadcast(fences), Seq("event_type"))
      .select($"event_type", $"lo", $"hi", $"value",
        least(greatest($"value", $"lo"), $"hi").as("clipped"))
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        first($"lo").as("p05"),
        first($"hi").as("p95"),
        sum(when($"value" < $"lo", 1L).otherwise(0L)).as("n_clipped_low"),
        sum(when($"value" > $"hi", 1L).otherwise(0L)).as("n_clipped_high"),
        dsum($"clipped").as("winsorized_sum"))
      .withColumn("winsorized_mean", $"winsorized_sum" / $"n_events")
      .orderBy($"event_type")
  }

  val winsorizeSql: String =
    s"""WITH fences AS (
       |  SELECT event_type,
       |         percentile_disc($Lo) WITHIN GROUP (ORDER BY value) AS lo,
       |         percentile_disc($Hi) WITHIN GROUP (ORDER BY value) AS hi
       |  FROM events GROUP BY event_type),
       |clamped AS (
       |  SELECT e.event_type, f.lo, f.hi, e.value,
       |         least(greatest(e.value, f.lo), f.hi) AS clipped
       |  FROM events e JOIN fences f USING (event_type))
       |SELECT event_type,
       |       count(*) AS n_events,
       |       first(lo) AS p05,
       |       first(hi) AS p95,
       |       CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_clipped_low,
       |       CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_clipped_high,
       |       ${sqlSum("clipped")} AS winsorized_sum,
       |       ${sqlSum("clipped")} / count(*) AS winsorized_mean
       |FROM clamped
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x55_winsorized_stats" -> winsorize _)

  val oracles: Map[String, String] = Map(
    "x55_winsorized_stats" -> winsorizeSql)
}
