package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X28/X29 — data-mixture construction: the two samplers a training-data
  * build runs after curation to hit a target language/source mixture.
  *
  * X28 `stratifiedSample` — rate-based stratified sampling. Each stratum
  * (language) keeps a configured fraction of its documents, decided by a
  * DETERMINISTIC hash bucket of the document id (`md5Long40(doc_id||salt)
  * % denom < num`), not by `rand()`: the sample is reproducible across
  * runs/retries/engines, documents keep or drop independently of
  * partitioning, and upsampling a stratum later only ADDS documents
  * (bucket < num is monotone in num). Scale shape: completely row-local —
  * a filter inside the scan, no shuffle, no state; the rate table is a
  * CASE expression (a broadcast map in the general case).
  *
  * X29 `qualityQuota` — per-stratum quality quota: the N highest-quality
  * documents per language (the "take the best N per bucket" mixture
  * rule). The naive plan — one `row_number() OVER (PARTITION BY lang)`
  * window — shuffles EVERY row of a stratum into one task; at 100 TB a
  * language is tens of terabytes, so that task is the job. This operator
  * computes the identical result with a salted two-phase top-N:
  *
  *  1. phase 1: row_number over (lang, salt) for a hash-derived salt in
  *     [0, S) — S parallel windows per stratum, each keeping its own
  *     top N; the global per-lang top N is a subset of the union of the
  *     per-salt top Ns (every survivor beats N others in its own salt
  *     group), so phase 1 is a lossless prefilter that caps the data
  *     entering phase 2 at S·N rows per stratum;
  *  2. phase 2: the exact window over `lang` alone, on ≤ S·N rows per
  *     stratum — bounded work independent of corpus size.
  *
  * Ordering ties are broken by doc_id, so the selected set and ranks are
  * total-order deterministic; quality_score is Text.qualityOf's double
  * (bit-identical in both engines, proven by the X10 gate).
  */
object Mixing {

  /** X28 rates: numerators over [[SampleDenom]], per language. */
  val SampleDenom = 8
  private def rateNum(lang: org.apache.spark.sql.Column) =
    when(lang === "en", 4).when(lang === "zh", 1).otherwise(2)

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("bucket",
        Hashing.md5Long40(concat($"doc_id".cast("string"), lit(":mix")))
          % SampleDenom)
      .filter($"bucket" < rateNum($"lang"))
      .select($"doc_id", $"lang", $"source", $"bucket")
      .orderBy($"doc_id")
  }

  val stratifiedSampleSql: String =
    s"""WITH b AS (
       |  SELECT doc_id, lang, source,
       |         ${Hashing.sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':mix'")}
       |           % $SampleDenom AS bucket
       |  FROM documents)
       |SELECT doc_id, lang, source, bucket
       |FROM b
       |WHERE bucket < CASE WHEN lang = 'en' THEN 4
       |                    WHEN lang = 'zh' THEN 1
       |                    ELSE 2 END
       |ORDER BY doc_id""".stripMargin

  /** X29 quota and salt fan-out (S parallel pre-windows per stratum). */
  val QuotaN = 30
  val QuotaSalts = 8

  def qualityQuota(spark: SparkSession, dir: String): DataFrame =
    qualityQuotaOf(Tables.documents(spark, dir), QuotaN, QuotaSalts)

  private[graft] def qualityQuotaOf(docs: DataFrame, n: Int, salts: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = Text.qualityOf(docs)
      .select($"doc_id", $"lang", $"quality_score")
    // phase 1: lossless salted prefilter — caps phase 2 at salts·n rows
    // per stratum regardless of corpus size
    val salted = scored.withColumn("salt",
      Hashing.md5Long40($"doc_id".cast("string")) % salts)
    val preW = Window.partitionBy($"lang", $"salt")
      .orderBy($"quality_score".desc, $"doc_id".asc)
    val pre = salted
      .withColumn("prn", row_number().over(preW))
      .filter($"prn" <= n)
      .drop("salt", "prn")
    // phase 2: the exact per-stratum window, now over bounded input
    val finW = Window.partitionBy($"lang")
      .orderBy($"quality_score".desc, $"doc_id".asc)
    pre
      .withColumn("rk", row_number().over(finW))
      .filter($"rk" <= n)
      .select($"doc_id", $"lang", $"quality_score", $"rk")
      .orderBy($"lang", $"rk")
  }

  val qualityQuotaSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, text,
       |         string_split_regex(trim(lower(text)), '\\s+') AS words
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, lang,
       |         CAST(len(words) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(words, w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
       |         CAST(length(regexp_replace(lower(text), '\\s+', '', 'g')) AS BIGINT) AS swc
       |  FROM t),
       |q AS (
       |  SELECT doc_id, lang,
       |         least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
       |           + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
       |           + least(1.0, (CAST(swc AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 8.0) * 0.2
       |           AS quality_score
       |  FROM m),
       |r AS (
       |  SELECT doc_id, lang, quality_score,
       |         row_number() OVER (PARTITION BY lang
       |           ORDER BY quality_score DESC, doc_id ASC) AS rk
       |  FROM q)
       |SELECT doc_id, lang, quality_score, rk
       |FROM r
       |WHERE rk <= $QuotaN
       |ORDER BY lang, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x28_stratified_sample" -> stratifiedSample _,
    "x29_quality_quota" -> qualityQuota _)

  val oracles: Map[String, String] = Map(
    "x28_stratified_sample" -> stratifiedSampleSql,
    "x29_quality_quota" -> qualityQuotaSql)
}
