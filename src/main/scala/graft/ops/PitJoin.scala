package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.OracleSafe

/** B54 — SCD2 point-in-time join: every lineitem looked up against the
  * customer's B37 priority-version history AS OF its ship date — the
  * warehouse temporal pattern ("which dimension version was in force
  * when this fact happened") that closes the SCD2 loop: B37 BUILDS the
  * [valid_from, valid_to) versions, B54 CONSUMES them from the fact
  * side. Distinct from B26's as-of join (nearest prior EVENT): here the
  * dimension side is an interval set that partitions time per key, so
  * the match is an interval-containment equi-join with fan-out at most
  * 1, made TOTAL by a left join: a fact dated before the customer's
  * first version (the generator does not enforce shipdate ≥ orderdate)
  * lands in an explicit `(none)` bucket instead of silently dropping —
  * the PIT analog of a failed dimension lookup. Conservation (every
  * lineitem appears exactly once) is pinned in PitJoinSpec.
  *
  * Plan shape at 100 TB: ONE custkey-keyed hash join between the fact
  * stream (lineitem ⋈ orders on orderkey to surface the custkey — the
  * b04 fact-fact shape) and the vocabulary-of-customers-sized version
  * frame; the interval predicate rides the join as a residual filter,
  * never a range-only join (no banding needed — versions per customer
  * are few, so per-key candidate fan-out is the version count, not a
  * band width). The rollup after is a standard two-phase aggregate.
  * Revenue goes through OracleSafe decimal sums (order-independent).
  */
object PitJoin {

  def scd2PitJoin(spark: SparkSession, dir: String): DataFrame =
    scd2PitJoinOf(Tables.orders(spark, dir), Tables.lineitem(spark, dir))

  /** Core of B54 over any orders/lineitem-shaped frames; test seam. */
  private[graft] def scd2PitJoinOf(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val iv = Relational.scd2IntervalsOf(orders)
      .select($"o_custkey".as("custkey"), $"o_orderpriority".as("prio_at_ship"),
        $"valid_from", $"valid_to")
    val facts = lineitem
      .select($"l_orderkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .join(orders.select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
    facts
      .join(iv, $"o_custkey" === $"custkey" &&
        $"valid_from" <= $"l_shipdate" &&
        ($"valid_to".isNull || $"l_shipdate" < $"valid_to"), "left")
      .groupBy(coalesce($"prio_at_ship", lit("(none)")).as("prio_at_ship"),
        year($"l_shipdate").as("ship_year"))
      .agg(count(lit(1)).as("n_items"),
        OracleSafe.dsum($"l_extendedprice" * (lit(1.0) - $"l_discount"))
          .as("revenue_q"))
      .orderBy($"prio_at_ship", $"ship_year")
  }

  val scd2PitJoinSql: String =
    """WITH v AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
      |         CASE WHEN lag(o_orderpriority, 1) OVER w IS NULL
      |                OR lag(o_orderpriority, 1) OVER w <> o_orderpriority
      |              THEN 1 ELSE 0 END AS chg
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_custkey
      |               ORDER BY o_orderdate ASC, o_orderkey ASC)),
      |r AS (
      |  SELECT o_custkey, o_orderpriority,
      |         sum(chg) OVER (PARTITION BY o_custkey
      |           ORDER BY o_orderdate ASC, o_orderkey ASC
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS version,
      |         o_orderdate
      |  FROM v),
      |g AS (
      |  SELECT o_custkey, version, o_orderpriority,
      |         min(o_orderdate) AS valid_from
      |  FROM r GROUP BY 1, 2, 3),
      |iv AS (
      |  SELECT o_custkey AS custkey, o_orderpriority AS prio_at_ship,
      |         valid_from,
      |         lead(valid_from, 1) OVER (PARTITION BY o_custkey
      |           ORDER BY version ASC) AS valid_to
      |  FROM g),
      |f AS (
      |  SELECT o.o_custkey, l.l_shipdate, l.l_extendedprice, l.l_discount
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT coalesce(iv.prio_at_ship, '(none)') AS prio_at_ship,
      |       CAST(year(f.l_shipdate) AS INTEGER) AS ship_year,
      |       count(*) AS n_items,
      |       CAST(sum(CAST(f.l_extendedprice * (1.0 - f.l_discount)
      |         AS DECIMAL(27,6))) AS DOUBLE) AS revenue_q
      |FROM f
      |LEFT JOIN iv ON f.o_custkey = iv.custkey
      |       AND iv.valid_from <= f.l_shipdate
      |       AND (iv.valid_to IS NULL OR f.l_shipdate < iv.valid_to)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b54_scd2_pit_join" -> scd2PitJoin _)

  val oracles: Map[String, String] = Map(
    "b54_scd2_pit_join" -> scd2PitJoinSql)
}
