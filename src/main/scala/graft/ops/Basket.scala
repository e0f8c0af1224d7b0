package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B46 — market-basket pair affinity: for every pair of event types,
  * how many users perform BOTH, and the lift of that co-occurrence over
  * independence — the classic association-rule sufficient statistic
  * (frequent-itemset pairs), here as the user×event_type basket view of
  * the events stream. Feeds recommendation heuristics and the "which
  * behaviors cluster" product questions the reference's dashboards ask
  * of aggregated metrics (spark_processor.py writes per-metric series;
  * this is the cross-metric association those series can't express).
  *
  * Shape: the baskets are the DISTINCT (user_id, event_type) pairs —
  * a two-phase aggregate that collapses event volume to user×type
  * cardinality BEFORE any pairing (at 100 TB the pair join moves
  * baskets, not events). Pair generation is a self-join on user_id with
  * `type_a < type_b`: co-partitioned on the user key, per-user fan-out
  * bounded by |event types|² (a small fixed domain — the event_type
  * dimension), never a cross join. Per-type totals and the user count
  * ride broadcast joins onto the ≤ |types|² pair rows.
  *
  * Parity: all counts exact i64. Lift = P(ab)/(P(a)·P(b)) is
  * rearranged to one division of exact integer products,
  * `(n_ab·n_users)/(n_a·n_b)` — both engines divide the identical
  * integers, so the IEEE quotient is bit-identical. Each product is
  * ≤ n_users², which fits i64/f64 exactly below ~9e7 users; past that
  * (plausible at 100 TB) the same expression moves to DECIMAL(38,0)
  * products with a decimal division — shape unchanged.
  */
object Basket {

  def pairLift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val baskets = Tables.events(spark, dir)
      .select($"user_id", $"event_type").distinct()

    val nUsers = baskets.select($"user_id").distinct()
      .agg(count(lit(1)).as("n_users"))
    val perType = baskets.groupBy($"event_type")
      .agg(count(lit(1)).as("n_type"))

    val a = baskets.select($"user_id", $"event_type".as("type_a"))
    val b = baskets.select($"user_id", $"event_type".as("type_b"))
    a.join(b, Seq("user_id")).where($"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n_users_both"))
      .join(broadcast(perType.select($"event_type".as("type_a"),
        $"n_type".as("n_users_a"))), Seq("type_a"))
      .join(broadcast(perType.select($"event_type".as("type_b"),
        $"n_type".as("n_users_b"))), Seq("type_b"))
      .crossJoin(broadcast(nUsers))
      .select($"type_a", $"type_b", $"n_users_both",
        $"n_users_a", $"n_users_b",
        (($"n_users_both" * $"n_users").cast("double") /
          ($"n_users_a" * $"n_users_b").cast("double")).as("lift"))
      .orderBy($"type_a", $"type_b")
  }

  val pairLiftSql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT user_id, event_type FROM events
      |), totals AS (
      |  SELECT count(DISTINCT user_id) AS n_users FROM baskets
      |), per_type AS (
      |  SELECT event_type, count(*) AS n_type FROM baskets GROUP BY 1
      |)
      |SELECT a.event_type AS type_a, b.event_type AS type_b,
      |       count(*) AS n_users_both,
      |       any_value(pa.n_type) AS n_users_a,
      |       any_value(pb.n_type) AS n_users_b,
      |       CAST(count(*) * any_value(t.n_users) AS DOUBLE)
      |         / CAST(any_value(pa.n_type) * any_value(pb.n_type) AS DOUBLE)
      |         AS lift
      |FROM baskets a
      |JOIN baskets b ON a.user_id = b.user_id
      |  AND a.event_type < b.event_type
      |JOIN per_type pa ON pa.event_type = a.event_type
      |JOIN per_type pb ON pb.event_type = b.event_type
      |CROSS JOIN totals t
      |GROUP BY 1, 2
      |ORDER BY type_a, type_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b46_basket_pair_lift" -> pairLift _)

  val oracles: Map[String, String] = Map(
    "b46_basket_pair_lift" -> pairLiftSql)
}
