package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X54 — sub-document (span-level) deduplication: the C4-style pipeline
  * step that whole-doc dedup (x01) and near-dup clustering (x02/x32)
  * both miss — boilerplate headers, license blocks, and templated
  * paragraphs repeat across MOSTLY-DISTINCT documents, and the fix is to
  * measure repetition at span granularity and drop documents whose text
  * is mostly corpus-duplicated spans.
  *
  * Each document tiles into consecutive non-overlapping
  * [[SpanTokens]]-token spans (row-local: exact integer span count →
  * explode → slice, the x33 chunking shape); spans key by the engine's
  * portable 40-bit md5 ([[graft.functions.Hashing.md5Long40]]) — at
  * open scale you never shuffle raw span text, and the oracle computes
  * the IDENTICAL hash (`md5_number_lower % 2^40`), so parity includes
  * the keying. A span is duplicated when its corpus frequency ≥ 2
  * (intra-doc repeats count — by design, x27's repetition signal at
  * corpus width); a document drops when more than [[DropRatio]] of its
  * spans are duplicated. Short docs (< [[SpanTokens]] tokens, zero
  * spans) are kept: no evidence, no verdict.
  *
  * Scale shape: one tokenize+tile pass (explode bounded by doc length /
  * span width), corpus span counts as a partial-aggregated groupBy on
  * the i64 hash, one hash join back to spans (co-partitioned with the
  * aggregate that produced it), per-doc re-aggregate, then a doc_id
  * join to restore zero-span docs and one |sources|-group rollup. No
  * windows, no driver state, every count exact i64.
  */
object SpanDedup {

  val SpanTokens = 8
  /** Drop a doc when dup_spans / spans exceeds this (strictly). */
  val DropRatio = 0.5

  def spanDedup(spark: SparkSession, dir: String): DataFrame =
    spanDedupOf(Tables.documents(spark, dir))

  /** Core of X54 over any (doc_id, source, text) frame; test seam. */
  def spanDedupOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = SpanTokens
    val toks = docs.select($"doc_id", $"source",
      split(trim(lower($"text")), "\\s+").as("w"))

    val spans = toks
      .withColumn("n_spans", expr(s"size(w) div $k"))
      .filter($"n_spans" > 0)
      .select($"doc_id",
        explode(expr(s"sequence(0, n_spans - 1)")).as("i"), $"w")
      .select($"doc_id",
        Hashing.md5Long40(expr(s"concat_ws(' ', slice(w, i * $k + 1, $k))"))
          .as("h"))

    val freq = spans.groupBy($"h").agg(count(lit(1)).as("c"))

    val perDoc = spans.join(freq, Seq("h"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(when($"c" >= 2, 1L).otherwise(0L)).as("n_dup"))

    docs.select($"doc_id", $"source")
      .join(perDoc, Seq("doc_id"), "left")
      .select($"source",
        coalesce($"n_spans", lit(0L)).as("n_spans"),
        coalesce($"n_dup", lit(0L)).as("n_dup"))
      .withColumn("dropped",
        when($"n_spans" > 0 &&
          $"n_dup".cast("double") > lit(DropRatio) * $"n_spans".cast("double"),
          1L).otherwise(0L))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"dropped").as("n_dropped"),
        sum($"n_spans").as("n_spans"),
        sum($"n_dup").as("n_dup_spans"))
      .orderBy($"source")
  }

  val spanDedupSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tiled AS (
       |  SELECT doc_id, unnest(range(len(w) // $SpanTokens)) AS i, w
       |  FROM d WHERE len(w) // $SpanTokens > 0),
       |spans AS (
       |  SELECT doc_id,
       |         ${Hashing.sqlMd5Long40(
             s"array_to_string(w[i * $SpanTokens + 1 : (i + 1) * $SpanTokens], ' ')")} AS h
       |  FROM tiled),
       |freq AS (SELECT h, count(*) AS c FROM spans GROUP BY h),
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_spans,
       |         sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS n_dup
       |  FROM spans JOIN freq USING (h)
       |  GROUP BY doc_id),
       |docs AS (
       |  SELECT d.source,
       |         coalesce(p.n_spans, 0) AS n_spans,
       |         coalesce(p.n_dup, 0) AS n_dup
       |  FROM d LEFT JOIN per_doc p USING (doc_id))
       |SELECT source,
       |       count(*) AS n_docs,
       |       CAST(sum(CASE WHEN n_spans > 0 AND CAST(n_dup AS DOUBLE)
       |                  > $DropRatio * CAST(n_spans AS DOUBLE)
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |       CAST(sum(n_spans) AS BIGINT) AS n_spans,
       |       CAST(sum(n_dup) AS BIGINT) AS n_dup_spans
       |FROM docs
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x54_span_dedup" -> spanDedup _)

  val oracles: Map[String, String] = Map(
    "x54_span_dedup" -> spanDedupSql)
}
