package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.countInSet

/** X72 — filter-cascade attrition report: the observability ledger of a
  * training-data curation funnel. Every document is evaluated against an
  * ORDERED rule list (short → stopword-sparse → long-words →
  * repetitive) and attributed to its FIRST failing rule; the report is
  * one row per rule with how many documents reached it, how many it
  * dropped, and how many remain — the per-stage attrition a pipeline
  * operator reads before touching thresholds. Complements x10 (the
  * scalar quality score) and x22 (the pipeline that acts on it) with
  * the why-was-it-dropped accounting neither exposes.
  *
  * Plan shape at 100 TB: ONE map pass computes every rule flag
  * row-locally (split/regexp/array ops, all codegen), a single global
  * partial-aggregated row of conditional counts follows (map-side
  * combine → 5 longs per task, no shuffle of documents), and the
  * 4-row ledger is a literal-array explode over that one row — no
  * window, no second pass, no driver collect.
  *
  * Parity: every rule is an exact-integer cross-multiplication
  * (n_stop·25 < n_tokens, not n_stop/n_tokens < 0.04) so no float ever
  * enters the gate; counts are i64 both engines (DuckDB sums cast from
  * HUGEINT).
  */
object Cascade {

  def filterCascade(spark: SparkSession, dir: String): DataFrame =
    filterCascadeOf(Tables.documents(spark, dir))

  /** X72 over any (doc_id, text) frame — ScaleBench seam. */
  private[graft] def filterCascadeOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(trim(lower($"text")), "\\s+")
    val flags = docs
      .select($"doc_id", $"text")
      .withColumn("words", words)
      .withColumn("n_tokens", size($"words").cast("long"))
      .withColumn("n_stop", countInSet($"words", Seq("the", "a")).cast("long"))
      .withColumn("swc",
        length(regexp_replace(lower($"text"), "\\s+", "")).cast("long"))
      .withColumn("n_distinct", size(array_distinct($"words")).cast("long"))
      .withColumn("first_fail",
        when($"n_tokens" < 24, 1)
          .when($"n_stop" * 25 < $"n_tokens", 2)
          .when($"swc" * 10 > $"n_tokens" * 48, 3)
          .when(($"n_tokens" - $"n_distinct") * 3 > $"n_tokens" * 2, 4)
          .otherwise(0))

    val one = flags.agg(
      count(lit(1)).as("total"),
      sum(when($"first_fail" === 1, 1L).otherwise(0L)).as("d1"),
      sum(when($"first_fail" === 2, 1L).otherwise(0L)).as("d2"),
      sum(when($"first_fail" === 3, 1L).otherwise(0L)).as("d3"),
      sum(when($"first_fail" === 4, 1L).otherwise(0L)).as("d4"))

    def row(order: Int, name: String, reaching: org.apache.spark.sql.Column,
        dropped: org.apache.spark.sql.Column) =
      struct(lit(order).as("rule_order"), lit(name).as("rule"),
        reaching.as("n_reaching"), dropped.as("n_dropped"))

    one.select(explode(array(
        row(1, "short", $"total", $"d1"),
        row(2, "stop_sparse", $"total" - $"d1", $"d2"),
        row(3, "long_words", $"total" - $"d1" - $"d2", $"d3"),
        row(4, "repetitive", $"total" - $"d1" - $"d2" - $"d3", $"d4")))
        .as("r"))
      .select($"r.rule_order", $"r.rule", $"r.n_reaching", $"r.n_dropped",
        ($"r.n_reaching" - $"r.n_dropped").as("n_remaining"))
      .orderBy($"rule_order")
  }

  val filterCascadeSql: String =
    """WITH m AS (
      |  SELECT doc_id, text,
      |         string_split_regex(trim(lower(text)), '\s+') AS words
      |  FROM documents),
      |f AS (
      |  SELECT doc_id,
      |    CAST(len(words) AS BIGINT) AS n_tokens,
      |    CAST(len(list_filter(words, w -> w = 'the' OR w = 'a'))
      |      AS BIGINT) AS n_stop,
      |    CAST(length(regexp_replace(lower(text), '\s+', '', 'g'))
      |      AS BIGINT) AS swc,
      |    CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct
      |  FROM m),
      |ff AS (
      |  SELECT CASE WHEN n_tokens < 24 THEN 1
      |              WHEN n_stop * 25 < n_tokens THEN 2
      |              WHEN swc * 10 > n_tokens * 48 THEN 3
      |              WHEN (n_tokens - n_distinct) * 3 > n_tokens * 2 THEN 4
      |              ELSE 0 END AS first_fail
      |  FROM f),
      |a AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN first_fail = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
      |    CAST(sum(CASE WHEN first_fail = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
      |    CAST(sum(CASE WHEN first_fail = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
      |    CAST(sum(CASE WHEN first_fail = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4
      |  FROM ff)
      |SELECT * FROM (
      |  SELECT 1 AS rule_order, 'short' AS rule,
      |         total AS n_reaching, d1 AS n_dropped,
      |         total - d1 AS n_remaining FROM a
      |  UNION ALL SELECT 2, 'stop_sparse', total - d1, d2,
      |         total - d1 - d2 FROM a
      |  UNION ALL SELECT 3, 'long_words', total - d1 - d2, d3,
      |         total - d1 - d2 - d3 FROM a
      |  UNION ALL SELECT 4, 'repetitive', total - d1 - d2 - d3, d4,
      |         total - d1 - d2 - d3 - d4 FROM a)
      |ORDER BY rule_order""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x72_filter_cascade" -> filterCascade _)

  val oracles: Map[String, String] = Map(
    "x72_filter_cascade" -> filterCascadeSql)
}
