package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKLongPairs

/** B56 — grouped top-k: the k best rows of EACH group (here: every
  * customer's 3 highest-value orders, price ties broken by order key),
  * computed as a partial-merge aggregate rather than a windowed
  * row_number.
  *
  * B15 is GLOBAL top-k (TakeOrderedAndProject); the grouped form is the
  * other top-k a warehouse runs constantly ("top n docs per source by
  * quality", "top n queries per tenant") and its naive window form —
  * row_number() OVER (PARTITION BY g ORDER BY …) ≤ k — shuffles and
  * sorts the ENTIRE input. The [[TopKLongPairs]] aggregate bounds what
  * crosses the wire at k pairs per (group, map task): the exact analog
  * of what TakeOrderedAndProject does globally, expressed through the
  * public Aggregator surface so Catalyst runs it as
  * ObjectHashAggregate(partial) → exchange → ObjectHashAggregate(final).
  *
  * Exactness: price ranks as exact i64 cents (`round(price·100)`, the
  * x90 convention); descending order is the negated key. The DuckDB
  * oracle computes the same answer through the window form — two
  * independent derivations of grouped top-k, hash-compared.
  *
  * Reference scope: the reference pipeline (spark_processor.py) has no
  * ranking ops at all; this is part of the engine-baseline surface
  * (SURVEY §2.4).
  */
object GroupedTopK {

  val K = 3

  def groupedTopK(spark: SparkSession, dir: String): DataFrame =
    groupedTopKOf(Tables.orders(spark, dir))

  /** Core over any orders-shaped frame; test seam. */
  private[graft] def groupedTopKOf(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val tk = udaf(new TopKLongPairs(K))
    orders
      .select($"o_custkey",
        (-round($"o_totalprice" * 100).cast("long")).as("k1"),
        $"o_orderkey".as("k2"))
      .groupBy($"o_custkey")
      .agg(tk($"k1", $"k2").as("top"))
      .select($"o_custkey", posexplode($"top"))
      .select($"o_custkey",
        ($"pos" + 1).cast("long").as("rk"),
        $"col._2".as("o_orderkey"),
        (-$"col._1").as("price_cents"))
      .orderBy($"o_custkey", $"rk")
  }

  val groupedTopKSql: String =
    s"""SELECT o_custkey, rk, o_orderkey, price_cents FROM (
       |  SELECT o_custkey, o_orderkey,
       |         CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       |         CAST(row_number() OVER (
       |           PARTITION BY o_custkey
       |           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT) DESC,
       |                    o_orderkey) AS BIGINT) AS rk
       |  FROM orders)
       |WHERE rk <= $K
       |ORDER BY o_custkey, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b56_grouped_topk" -> groupedTopK _)

  val oracles: Map[String, String] = Map(
    "b56_grouped_topk" -> groupedTopKSql)
}
