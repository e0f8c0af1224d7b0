package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (most-recent-at-or-before) join — the canonical time-series
  * operator Spark has no native form of. Built Spark-first by
  * composition (preference order (a) in the engine's design rules):
  * tag both streams, union, and carry the right side's payload forward
  * with `last(_, ignoreNulls)` over a (key, time)-ordered window. One
  * shuffle+sort keyed on the join key — the same cost profile as a
  * sort-merge join, and the shape that scales: per-key partitions,
  * no point-in-time loop, no broadcast of the full right side.
  *
  * Ties (right row exactly at the left row's timestamp) are inclusive —
  * the equal-time right row wins, matching DuckDB's `ASOF JOIN`
  * (`ts >= right.ts` semantics), which the oracle uses as an independent
  * implementation to validate against. The right side is deduplicated to
  * one row per (key, ts) first (deterministic latest-key tiebreak), since
  * as-of is otherwise undefined on duplicate timestamps.
  */
object AsOf {

  /** Generic as-of join: for each left row, attach the payload of the
    * latest right row with the same key and `rightTs <= leftTs`.
    *
    * @param left     left stream, must contain `key` and `ts`
    * @param right    right stream, must contain `key`, `ts`, and payload
    * @param payload  right-side columns to carry (become nullable)
    */
  /** As-of join with a staleness bound: like [[join]], but a matched
    * right row older than `toleranceSec` before the left timestamp is
    * treated as no-match (payload nulled) — the pandas merge_asof
    * `tolerance` semantics. Implemented by carrying the right row's own
    * timestamp alongside its payload and age-filtering after the carry.
    */
  def joinWithTolerance(
      left: DataFrame, right: DataFrame,
      payload: Seq[String], toleranceSec: Long): DataFrame = {
    val carried = join(left, right.withColumn("asof_ts", col("ts")),
      payload :+ "asof_ts")
    val fresh = col("asof_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("asof_ts")) <= toleranceSec * 1000000L
    payload.foldLeft(carried) { (df, p) =>
      df.withColumn(p, when(fresh, col(p)))
    }.drop("asof_ts")
  }

  /** Direction-complete as-of join: `backward` (latest at-or-before,
    * = [[join]]), `forward` (earliest at-or-after — the same carry with
    * the scan order reversed), or `nearest` (closer of the two, ties to
    * backward — pandas merge_asof semantics).
    */
  def joinDirectional(
      left: DataFrame, right: DataFrame,
      payload: Seq[String], direction: String): DataFrame = {
    direction match {
      case "backward" => join(left, right, payload)
      case "forward" =>
        joinCarry(left, right.withColumn("asof_ts", col("ts")),
          payload :+ "asof_ts", forward = true).drop("asof_ts")
      case "nearest" =>
        val back = joinCarry(left, right.withColumn("asof_ts", col("ts")),
          payload :+ "asof_ts", forward = false)
          .withColumnsRenamed(((payload :+ "asof_ts").map(p => p -> s"b_$p")).toMap)
        val leftKeyCols = left.columns.toSeq
        val fwd = joinCarry(back, right.withColumn("asof_ts", col("ts")),
          payload :+ "asof_ts", forward = true)
        val backCloser = col("b_asof_ts").isNotNull &&
          (col("asof_ts").isNull ||
            unix_micros(col("ts")) - unix_micros(col("b_asof_ts")) <=
              unix_micros(col("asof_ts")) - unix_micros(col("ts")))
        payload.foldLeft(fwd) { (df, p) =>
          df.withColumn(p, when(backCloser, col(s"b_$p")).otherwise(col(p)))
        }.select(leftKeyCols.map(col) ++ payload.map(col): _*)
      case other => throw new IllegalArgumentException(s"unknown direction: $other")
    }
  }

  /** The shared carry: union-tag then last-non-null over a (key, ts)
    * window scanned forward (backward join) or reversed (forward join).
    */
  private def joinCarry(
      left: DataFrame, right: DataFrame,
      payload: Seq[String], forward: Boolean): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val rightDedup = right
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key", $"ts").orderBy(payload.map(col(_).desc): _*)))
      .filter($"rn" === 1).drop("rn")
    val leftCols = left.columns.filterNot(payload.contains)
    val tagged = left
      .withColumn("src", lit(1))
      .select((leftCols.map(col) :+ col("src")) ++
        payload.map(p => lit(null).cast(rightDedup.schema(p).dataType).as(p)): _*)
      .unionByName(
        rightDedup.select(
          (Seq(col("key"), col("ts"), lit(0).as("src")) ++
            payload.map(col) ++
            leftCols.filterNot(Seq("key", "ts").contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*),
        allowMissingColumns = false)
    val order = if (forward) Seq($"ts".desc, $"src".asc) else Seq($"ts".asc, $"src".asc)
    val w = Window.partitionBy($"key")
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .select((leftCols.map(col) :+ col("src")) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter($"src" === 1)
      .drop("src")
  }

  def join(left: DataFrame, right: DataFrame, payload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    // one right row per (key, ts): deterministic survivor
    val rightDedup = right
      .withColumn("rn", row_number().over(
        Window.partitionBy($"key", $"ts").orderBy(payload.map(col(_).desc): _*)))
      .filter($"rn" === 1).drop("rn")
    val leftCols = left.columns.filterNot(payload.contains)
    val tagged = left
      .withColumn("src", lit(1)) // left sorts after right at equal ts
      .select((leftCols.map(col) :+ col("src")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
      .unionByName(
        rightDedup.select(
          (Seq(col("key"), col("ts"), lit(0).as("src")) ++
            payload.map(col) ++
            leftCols.filterNot(Seq("key", "ts").contains)
              .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*),
        allowMissingColumns = false)
    val w = Window.partitionBy($"key")
      .orderBy($"ts".asc, $"src".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .select((leftCols.map(col) :+ col("src")) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .filter($"src" === 1)
      .drop("src")
  }

  /** Registered query: each event joined to the user's most recent order
    * at-or-before the event time (events.user_id ↔ orders.o_custkey).
    */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val left = Tables.events(spark, dir)
      .select($"user_id".as("key"), $"ts", $"event_id", $"value")
    val right = Tables.orders(spark, dir)
      .select($"o_custkey".as("key"), $"o_orderdate".as("ts"),
        $"o_orderkey", $"o_totalprice")
    join(left, right, Seq("o_orderkey", "o_totalprice"))
      .select($"event_id", $"key".as("user_id"),
        $"ts".cast("timestamp_ntz").as("ts"),
        $"value", $"o_orderkey".as("asof_orderkey"),
        $"o_totalprice".as("asof_totalprice"))
      .orderBy($"event_id")
  }

  val eventsAsOfOrdersSql: String =
    """WITH e AS (
      |  SELECT user_id AS key, CAST(ts AS TIMESTAMP) AS ts, event_id, value
      |  FROM events),
      |o AS (
      |  SELECT key, ts, o_orderkey, o_totalprice
      |  FROM (SELECT o_custkey AS key, o_orderdate AS ts, o_orderkey, o_totalprice,
      |               row_number() OVER (PARTITION BY o_custkey, o_orderdate
      |                                  ORDER BY o_orderkey DESC, o_totalprice DESC) AS rn
      |        FROM orders)
      |  WHERE rn = 1)
      |SELECT e.event_id, e.key AS user_id, e.ts, e.value,
      |       o.o_orderkey AS asof_orderkey,
      |       o.o_totalprice AS asof_totalprice
      |FROM e ASOF LEFT JOIN o
      |  ON e.key = o.key AND e.ts >= o.ts
      |ORDER BY e.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b26_asof_join" -> eventsAsOfOrders _)

  val oracles: Map[String, String] = Map(
    "b26_asof_join" -> eventsAsOfOrdersSql)
}
