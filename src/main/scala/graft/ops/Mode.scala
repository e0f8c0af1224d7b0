package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B52 — grouped mode (most frequent value) with a deterministic
  * tiebreak: the modal quantity per return flag, its multiplicity, and
  * the group's distinct-value count — the classic MODE() aggregate most
  * engines bolt on, expressed as two chained partial-aggregable
  * aggregates instead of a group-materializing sort.
  *
  * Shape at 100 TB: first aggregate collapses the fact stream to the
  * DISTINCT (group, value) pairs (map-side combine — the shuffle moves
  * value cardinality, never fact rows), second is an argmax via
  * `min(struct(-cnt, value))` — associative, merges map-side, no window
  * over the value set and no per-group sort. Ties break to the SMALLEST
  * value (the struct order), so the result is total-order deterministic
  * in both engines. l_quantity is integral by construction (TPC-H), so
  * the i64 cast is exact.
  */
object Mode {

  def groupedMode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_quantity".cast("long").as("qty"))
      .groupBy($"l_returnflag", $"qty")
      .agg(count(lit(1)).as("cnt"))
      .groupBy($"l_returnflag")
      .agg(min(struct((-$"cnt").as("neg_cnt"), $"qty")).as("m"),
        count(lit(1)).as("n_distinct_values"))
      .select($"l_returnflag",
        $"m.qty".as("mode_qty"),
        (-$"m.neg_cnt").as("mode_cnt"),
        $"n_distinct_values")
      .orderBy($"l_returnflag")
  }

  val groupedModeSql: String =
    """WITH c AS (
      |  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty,
      |         count(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (
      |  SELECT *,
      |         row_number() OVER (PARTITION BY l_returnflag
      |                            ORDER BY cnt DESC, qty ASC) AS rk,
      |         count(*) OVER (PARTITION BY l_returnflag) AS ndv
      |  FROM c)
      |SELECT l_returnflag, qty AS mode_qty, cnt AS mode_cnt,
      |       CAST(ndv AS BIGINT) AS n_distinct_values
      |FROM r WHERE rk = 1
      |ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b52_grouped_mode" -> groupedMode _)

  val oracles: Map[String, String] = Map(
    "b52_grouped_mode" -> groupedModeSql)
}
