package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X64 — embedding-dimension health profile: per-dimension count,
  * quantized-zero count, mean, variance, and value range over the
  * corpus — the diagnostic that catches dead dimensions (variance ~ 0:
  * wasted index width), collapsed encoders (a few dims carrying all
  * variance), and range blowouts before anyone builds an ANN index
  * (x14/x19/x31) or quantizer (x48) on top. Complements x36 (per-group
  * centroids) with the per-dimension second moment.
  *
  * One posexplode + one (dim)-keyed aggregate: partial aggs collapse
  * each scan task's vectors to |dims| rows before the tiny |dims|-row
  * shuffle — the mergeable-moments shape (n, Σq, Σq²) that scales to
  * any corpus. Never a per-vector collect, never a second pass.
  *
  * Parity: moments accumulate as exact i64 sums of fixed-point terms
  * (q = floor(v·1e6): i64 sums commute, float sums don't — the x36
  * rule). Variance = (n·Σq² − (Σq)²) / (n²·scale²) runs the integer
  * part in DECIMAL(38,0) (n·Σq² overflows i64 past ~10⁶ vectors) and
  * divides once as double, identical order both engines; min/max pick
  * existing float values (order-independent, bit-identical after the
  * same float→double widening).
  */
object EmbedProfile {

  def embedProfile(spark: SparkSession, dir: String): DataFrame =
    profileOf(Tables.embeddings(spark, dir))

  /** Core of X64 over any frame with an `embedding: array<float>`
    * column; test seam (partition-invariance pins reshuffled inputs).
    */
  def profileOf(vecs: DataFrame): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs
      .select(posexplode($"embedding").as(Seq("dim", "v")))
      .select($"dim".cast("long").as("dim"),
        $"v".cast("double").as("v"),
        floor($"v".cast("double") * Centroids.Scale).cast("long").as("q"))
      .groupBy($"dim")
      .agg(
        count(lit(1)).as("n_vectors"),
        sum(when($"q" === 0L, 1L).otherwise(0L)).as("n_zero_q"),
        sum($"q").as("sum_q"),
        sum($"q".cast("decimal(38,0)") * $"q".cast("decimal(38,0)"))
          .as("sumsq_q"),
        min($"v").as("min_v"),
        max($"v").as("max_v"))
      .select($"dim", $"n_vectors", $"n_zero_q",
        ($"sum_q".cast("double") /
          ($"n_vectors".cast("double") * Centroids.Scale)).as("mean_v"),
        (($"n_vectors".cast("decimal(38,0)") * $"sumsq_q" -
          $"sum_q".cast("decimal(38,0)") * $"sum_q".cast("decimal(38,0)"))
          .cast("double") /
          ($"n_vectors".cast("double") * $"n_vectors".cast("double") *
            Centroids.Scale * Centroids.Scale)).as("var_v"),
        $"min_v", $"max_v")
      .orderBy($"dim")
  }

  val embedProfileSql: String =
    s"""WITH e AS (
       |  SELECT i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS v,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE)
       |           * ${Centroids.Scale}) AS BIGINT) AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i)
       |), m AS (
       |  SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n_vectors,
       |         CAST(sum(CASE WHEN q = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_zero_q,
       |         CAST(sum(q) AS BIGINT) AS sum_q,
       |         sum(CAST(q AS HUGEINT) * CAST(q AS HUGEINT)) AS sumsq_q,
       |         min(v) AS min_v, max(v) AS max_v
       |  FROM e GROUP BY 1
       |)
       |SELECT dim, n_vectors, n_zero_q,
       |       CAST(sum_q AS DOUBLE)
       |         / (CAST(n_vectors AS DOUBLE) * ${Centroids.Scale})
       |         AS mean_v,
       |       CAST(CAST(n_vectors AS HUGEINT) * sumsq_q
       |              - CAST(sum_q AS HUGEINT) * CAST(sum_q AS HUGEINT)
       |            AS DOUBLE)
       |         / (CAST(n_vectors AS DOUBLE) * CAST(n_vectors AS DOUBLE)
       |            * ${Centroids.Scale} * ${Centroids.Scale})
       |         AS var_v,
       |       min_v, max_v
       |FROM m
       |ORDER BY dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x64_embed_profile" -> embedProfile _)

  val oracles: Map[String, String] = Map(
    "x64_embed_profile" -> embedProfileSql)
}
