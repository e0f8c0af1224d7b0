package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X149 — declarative data-quality expectations audit: a fixed set of
  * per-column contracts (non-null, unique key, categorical domain,
  * positive measure, non-empty text, key format) evaluated over the
  * corpus in ONE aggregation pass, emitting per-expectation violation
  * counts, rates, and a pass verdict — the ingestion gate every
  * production pipeline runs before data reaches training (the
  * Great-Expectations/dbt-test pattern, engine-native). Completes the
  * quality family: X25 profiles what the data IS, B45 audits
  * referential integrity ACROSS tables, X149 asserts what a single
  * table MUST BE.
  *
  * Exactness: every check is a conditional count (exact i64), the
  * uniqueness check is n_rows − countDistinct(key) (the one
  * Expand-based aggregate), violation_rate is one double division of
  * exact operands, and pass is an integer comparison — all hash-green.
  * The expectation list is CODE (a fixed contract, versioned with the
  * engine), not data — so the audit is one scan + one global aggregate
  * at any corpus size, with every check riding the same
  * map-side-combined pass; the output is |expectations| rows.
  *
  * Reference scope: the reference validates nothing (malformed rows
  * crash it — `spark_processor.py:183`); engine extension (SURVEY
  * §2.5, the X25/B45/X22 quality family).
  */
object Expectations {

  /** Accepted language codes (the data model's declared domain). */
  val LangDomain = Seq("en", "es", "de", "fr", "zh")

  def expectationsAudit(spark: SparkSession, dir: String): DataFrame =
    auditOf(Tables.documents(spark, dir))

  /** Core of X149 over any documents-shaped frame; test seam. */
  private[graft] def auditOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val agg = docs.agg(
      count(lit(1)).as("n_rows"),
      sum(when($"doc_id".isNull, 1L).otherwise(0L)).as("v_null_id"),
      countDistinct($"doc_id").as("n_ids"),
      // NULL is a violation, not a pass: `NOT IN`/`rlike` over NULL is
      // NULL, which `otherwise(0)` would count as clean — a quality
      // gate that greenlights null categorical/key-format columns
      // (round-12 advice). The isNull arm makes the contract total.
      sum(when($"lang".isNull || !$"lang".isin(LangDomain: _*), 1L)
        .otherwise(0L)).as("v_lang"),
      sum(when($"n_chars" <= 0L, 1L).otherwise(0L)).as("v_chars"),
      sum(when(length(trim($"text")) === 0, 1L).otherwise(0L))
        .as("v_text"),
      sum(when($"source".isNull || !$"source".rlike("^src[0-9]+$"), 1L)
        .otherwise(0L)).as("v_src"))
    agg
      .select($"n_rows", expr(
        """stack(6,
          |  'doc_id_not_null',  v_null_id,
          |  'doc_id_unique',    n_rows - n_ids,
          |  'lang_in_domain',   v_lang,
          |  'n_chars_positive', v_chars,
          |  'text_nonempty',    v_text,
          |  'source_format',    v_src) AS (expectation, n_violations)
          |""".stripMargin))
      .select($"expectation", $"n_rows",
        $"n_violations".cast("long").as("n_violations"),
        ($"n_violations".cast("double") / $"n_rows".cast("double"))
          .as("violation_rate"),
        ($"n_violations" === 0L).as("pass"))
      .orderBy($"expectation")
  }

  val expectationsAuditSql: String = {
    val langs = LangDomain.map(l => s"'$l'").mkString(", ")
    s"""WITH a AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_rows,
       |         CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
       |           AS BIGINT) AS v_null_id,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_ids,
       |         CAST(sum(CASE WHEN lang IS NULL OR lang NOT IN ($langs)
       |           THEN 1 ELSE 0 END) AS BIGINT) AS v_lang,
       |         CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END)
       |           AS BIGINT) AS v_chars,
       |         CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 1
       |           ELSE 0 END) AS BIGINT) AS v_text,
       |         CAST(sum(CASE WHEN source IS NULL OR NOT regexp_matches(
       |           source, '^src[0-9]+$$') THEN 1 ELSE 0 END) AS BIGINT)
       |           AS v_src
       |  FROM documents),
       |s AS (
       |  SELECT 'doc_id_not_null' AS expectation, n_rows,
       |         v_null_id AS n_violations FROM a
       |  UNION ALL SELECT 'doc_id_unique', n_rows, n_rows - n_ids FROM a
       |  UNION ALL SELECT 'lang_in_domain', n_rows, v_lang FROM a
       |  UNION ALL SELECT 'n_chars_positive', n_rows, v_chars FROM a
       |  UNION ALL SELECT 'text_nonempty', n_rows, v_text FROM a
       |  UNION ALL SELECT 'source_format', n_rows, v_src FROM a)
       |SELECT expectation, n_rows, n_violations,
       |       CAST(n_violations AS DOUBLE) / CAST(n_rows AS DOUBLE)
       |         AS violation_rate,
       |       (n_violations = 0) AS pass
       |FROM s
       |ORDER BY expectation""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x149_expectations_audit" -> expectationsAudit _)

  val oracles: Map[String, String] = Map(
    "x149_expectations_audit" -> expectationsAuditSql)
}
