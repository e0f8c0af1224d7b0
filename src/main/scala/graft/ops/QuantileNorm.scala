package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X89 — source-relative quantile normalization: each document's
  * quality score replaced by its exact percentile rank WITHIN its
  * source — the calibration step before cross-source mixing (x28/x46/
  * x73 quota logic): raw x10 scores are not comparable across sources
  * (a mid-tier web doc outscores a top-tier forum doc on absolute
  * score), so per-source thresholds must be rank-based, "keep the top
  * 30% of EACH source".
  *
  * Scale shape — the exact rank derives HIERARCHICALLY, never by one
  * per-source global sort window (a source at 100 TB is a skewed-huge
  * partition): bucket = floor(score·[[NBuckets]]) is row-local; bucket
  * offsets are a running sum over the ≤[[NBuckets]]-row per-source
  * count frame; the in-bucket row_number window partitions by
  * (source, bucket) — [[NBuckets]]× finer than a source partition, and
  * sub-dividable further by the same trick (the x42/x80 rank family).
  * Bucketing is order-preserving in score, so offset + in-bucket rank
  * IS the per-source rank — the DuckDB oracle computes the DIRECT
  * window form, so the hash gate proves the hierarchical derivation
  * exact (QuantileNormSpec additionally pins it in-engine).
  *
  * Exactness: the score is x10's identical-IEEE expression; floor of
  * an identical double is identical; everything after is i64 ranks;
  * pctl_q = (rank−1)/(n−1) is one IEEE division of identical i64
  * operands (every testdata source has n ≥ 2; a singleton source
  * would emit NULL in both engines — 0/0 is undefined rank-space).
  */
object QuantileNorm {

  val NBuckets = 20

  def sourceQuantileNorm(spark: SparkSession, dir: String): DataFrame =
    sourceQuantileNormOf(Tables.documents(spark, dir))

  /** Core of X89 over any (doc_id, source, text) frame; test seam. */
  private[graft] def sourceQuantileNormOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = Text.qualityOf(docs)
      .select($"source", $"doc_id", $"quality_score")
    val bucketed = scored.withColumn("bucket",
      least(floor($"quality_score" * NBuckets), lit(NBuckets - 1))
        .cast("long"))
    val counts = bucketed.groupBy($"source", $"bucket")
      .agg(count(lit(1)).as("c"))
    val bySrc = Window.partitionBy($"source").orderBy($"bucket".asc)
    val offsets = counts
      .withColumn("off", coalesce(sum($"c").over(
        bySrc.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", sum($"c").over(Window.partitionBy($"source")))
      .select($"source", $"bucket", $"off", $"n_src")
    val inBucket = Window.partitionBy($"source", $"bucket")
      .orderBy($"quality_score".asc, $"doc_id".asc)
    bucketed.join(offsets, Seq("source", "bucket"))
      .withColumn("src_rank",
        ($"off" + row_number().over(inBucket)).cast("long"))
      .select($"source", $"doc_id", $"quality_score", $"src_rank",
        when($"n_src" > 1, ($"src_rank" - 1).cast("double")
          / ($"n_src" - 1).cast("double")).as("pctl_q"))
      .orderBy($"source", $"doc_id")
  }

  /** The DIRECT per-source window form (see scaladoc: the oracle being
    * the direct form is what proves the hierarchical rank exact).
    */
  val sourceQuantileNormSql: String =
    s"""WITH ${Text.qualityScoreCtes},
      |d AS (
      |  SELECT doc.source, s.doc_id, s.quality_score
      |  FROM q_score s JOIN documents doc ON s.doc_id = doc.doc_id),
      |r AS (
      |  SELECT source, doc_id, quality_score,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY quality_score ASC, doc_id ASC) AS src_rank,
      |         count(*) OVER (PARTITION BY source) AS n_src
      |  FROM d)
      |SELECT source, doc_id, quality_score,
      |       CAST(src_rank AS BIGINT) AS src_rank,
      |       CASE WHEN n_src > 1 THEN
      |         CAST(src_rank - 1 AS DOUBLE) / CAST(n_src - 1 AS DOUBLE)
      |       END AS pctl_q
      |FROM r
      |ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x89_source_quantile_norm" -> sourceQuantileNorm _)

  val oracles: Map[String, String] = Map(
    "x89_source_quantile_norm" -> sourceQuantileNormSql)
}
