package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X25 — table profiling: per-column data-quality statistics (row count,
  * null count, exact distinct count, min/max) over `lineitem`, one row
  * per profiled column — the ingest-validation step a training pipeline
  * runs before trusting a new data drop (the engine-side core of tools
  * like Deequ/GE: the checks are aggregates; the rules engine is a
  * consumer).
  *
  * Plan shape: ONE aggregation pass computes every metric (Spark plans
  * the multi-column exact `count(DISTINCT …)` via Expand — a deliberate
  * cost: rows × profiled-columns in the map stage with partial
  * aggregation, the standard price of exact multi-column profiling; at
  * 100 TB swap `countDistinct` for `approx_count_distinct` and the same
  * single-pass plan profiles with HLL sketch state instead), then the
  * one result row unpivots into per-column rows with a row-local
  * explode — no second scan, no per-column jobs.
  *
  * Parity discipline: min/max are emitted only for binary-ordered types
  * (integers, dates, strings — both engines compare and render them
  * identically); float columns get counts only, because float→string
  * rendering differs across engines (the same hazard
  * functions/Hashing.scala quantizes around elsewhere).
  */
object Profile {

  // (column, emit min/max?) — the double columns (quantity, price,
  // discount, tax) get counts only
  private val cols: Seq[(String, Boolean)] = Seq(
    "l_orderkey" -> true, "l_partkey" -> true, "l_suppkey" -> true,
    "l_linenumber" -> true, "l_quantity" -> false,
    "l_extendedprice" -> false, "l_discount" -> false, "l_tax" -> false,
    "l_returnflag" -> true, "l_linestatus" -> true, "l_shipdate" -> true)

  def dataProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { case (c, minmax) =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_distinct")) ++
        (if (minmax) Seq(
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max"))
        else Nil)
    }
    // the Expand that plans the multi-column exact distinct multiplies
    // rows × profiled-columns BEFORE the partial aggregation — fan the
    // single-split local scan out first so that work parallelizes (at
    // cluster scale the scan's natural splits provide this; same local
    // artifact note as b09/b18c)
    val one = Tables.lineitem(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism)
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
    val perCol = array(cols.map { case (c, minmax) =>
      struct(
        lit(c).as("col_name"),
        col(s"${c}_nulls").as("n_nulls"),
        col(s"${c}_distinct").as("n_distinct"),
        (if (minmax) col(s"${c}_min") else lit(null).cast("string")).as("min_val"),
        (if (minmax) col(s"${c}_max") else lit(null).cast("string")).as("max_val"))
    }: _*)
    one.select($"n_rows", explode(perCol).as("p"))
      .select($"p.col_name".as("col_name"), $"n_rows", $"p.n_nulls".as("n_nulls"),
        $"p.n_distinct".as("n_distinct"), $"p.min_val".as("min_val"),
        $"p.max_val".as("max_val"))
      .orderBy($"col_name")
  }

  val dataProfileSql: String = {
    val branches = cols.map { case (c, minmax) =>
      val minExpr = if (minmax) s"CAST(min($c) AS VARCHAR)" else "NULL"
      val maxExpr = if (minmax) s"CAST(max($c) AS VARCHAR)" else "NULL"
      s"""SELECT '$c' AS col_name,
         |       count(*) AS n_rows,
         |       count(*) - count($c) AS n_nulls,
         |       count(DISTINCT $c) AS n_distinct,
         |       $minExpr AS min_val,
         |       $maxExpr AS max_val
         |FROM lineitem""".stripMargin
    }
    branches.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x25_data_profile" -> dataProfile _)

  val oracles: Map[String, String] = Map(
    "x25_data_profile" -> dataProfileSql)
}
