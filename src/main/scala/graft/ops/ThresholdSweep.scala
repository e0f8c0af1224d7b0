package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X85 — filter-threshold operating-characteristic sweep: for every
  * candidate quality-score cutoff, how many documents and how many
  * tokens would survive `quality_score >= t` — the tuning curve a
  * pipeline operator reads BEFORE committing a corpus filter (x10
  * scores, x72 explains drops at fixed thresholds; x85 answers "which
  * threshold spends my token budget"). One row per cutoff on a fixed
  * 1/[[Buckets]] grid with kept-doc and kept-token fractions.
  *
  * Determinism: the score is x10's exact IEEE expression (identical
  * operands both engines); the only new float step is `floor(score ·
  * Buckets)` — floor of an identical double is identical — after which
  * everything is exact i64 counting. The kept fractions are single
  * IEEE divisions of identical i64 operands (b50 idiom). Cutoffs are
  * REPORTED as bucket boundaries (b / Buckets as one literal division)
  * so no float threshold comparison ever happens: "score >= boundary b"
  * is evaluated as the integer `bucket >= b`.
  *
  * Scale shape: one row-local scoring pass (fully codegen — the x10
  * scorer), ONE [[Buckets]]-row partial-aggregated histogram of
  * (docs, tokens) per bucket, and the suffix accumulation runs on the
  * constant-size histogram via a broadcast grid join (20 × ≤20 rows —
  * the x80 bounded-literal idiom, no SinglePartition window, no second
  * pass over data). Corpus size never touches anything after the first
  * aggregate; the curve costs the same at 100 TB as the count(*).
  */
object ThresholdSweep {

  val Buckets = 20

  def thresholdSweep(spark: SparkSession, dir: String): DataFrame =
    thresholdSweepOf(Tables.documents(spark, dir))

  /** Core of X85 over any (doc_id, text) frame; test/ScaleBench seam. */
  private[graft] def thresholdSweepOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hist = Text.qualityOf(docs)
      .select(least(floor($"quality_score" * Buckets), lit(Buckets - 1))
        .cast("long").as("bucket"), $"n_tokens")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
    val totals = hist.agg(sum($"n_docs").as("t_docs"),
      sum($"n_tokens").as("t_tokens"))
    val grid = spark.range(0, Buckets).select($"id".as("thr_bucket"))
    // LEFT join + coalesce-to-0: a cutoff nothing survives must still
    // appear on the curve as an explicit zero row, never go missing —
    // an operator reading the sweep needs to SEE that a threshold
    // empties the corpus
    grid.join(broadcast(hist), $"bucket" >= $"thr_bucket", "left")
      .groupBy($"thr_bucket")
      .agg(coalesce(sum($"n_docs"), lit(0L)).as("n_kept"),
        coalesce(sum($"n_tokens"), lit(0L)).as("tok_kept"))
      .crossJoin(broadcast(totals))
      .select($"thr_bucket",
        ($"thr_bucket".cast("double") / lit(Buckets).cast("double"))
          .as("cutoff_q"),
        $"n_kept", $"tok_kept",
        ($"n_kept".cast("double") / $"t_docs".cast("double"))
          .as("doc_frac_q"),
        ($"tok_kept".cast("double") / $"t_tokens".cast("double"))
          .as("tok_frac_q"))
      .orderBy($"thr_bucket")
  }

  val thresholdSweepSql: String =
    s"""WITH ${Text.qualityScoreCtes},
      |h AS (
      |  SELECT CAST(least(floor(quality_score * $Buckets), $Buckets - 1)
      |           AS BIGINT) AS bucket,
      |         count(*) AS n_docs,
      |         CAST(sum(n_tokens) AS BIGINT) AS n_tokens
      |  FROM q_score GROUP BY 1),
      |tot AS (
      |  SELECT CAST(sum(n_docs) AS BIGINT) AS t_docs,
      |         CAST(sum(n_tokens) AS BIGINT) AS t_tokens
      |  FROM h),
      |grid AS (SELECT CAST(range AS BIGINT) AS thr_bucket
      |         FROM range(0, $Buckets))
      |SELECT g.thr_bucket,
      |       CAST(g.thr_bucket AS DOUBLE) / CAST($Buckets AS DOUBLE)
      |         AS cutoff_q,
      |       CAST(coalesce(sum(h.n_docs), 0) AS BIGINT) AS n_kept,
      |       CAST(coalesce(sum(h.n_tokens), 0) AS BIGINT) AS tok_kept,
      |       CAST(coalesce(sum(h.n_docs), 0) AS DOUBLE)
      |         / CAST(t.t_docs AS DOUBLE) AS doc_frac_q,
      |       CAST(coalesce(sum(h.n_tokens), 0) AS DOUBLE)
      |         / CAST(t.t_tokens AS DOUBLE) AS tok_frac_q
      |FROM grid g LEFT JOIN h ON h.bucket >= g.thr_bucket, tot t
      |GROUP BY g.thr_bucket, t.t_docs, t.t_tokens
      |ORDER BY g.thr_bucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x85_threshold_sweep" -> thresholdSweep _)

  val oracles: Map[String, String] = Map(
    "x85_threshold_sweep" -> thresholdSweepSql)
}
