package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X36 — per-group embedding centroids: the element-wise mean embedding
  * of each label group (the domain-centroid computation behind
  * clustering-based curation — distance-to-centroid filtering, domain
  * mixture analysis, IVF-style coarse codebook seeding from labeled
  * data).
  *
  * Plan shape: posexplode the vector to (label, dim, value) and run ONE
  * partial-aggregated groupBy on (label, dim) — the standard mergeable
  * centroid shape at any scale: map-side partial sums shrink the
  * shuffle to |labels| × dims rows per task, and no executor ever holds
  * more than its partial sums (contrast a collect-and-average or a
  * per-label `collect_list`, both of which materialize group members).
  *
  * Parity discipline: each term is quantized to i64
  * (`floor(value × 1e6)`) BEFORE summation — float sums are
  * order-dependent, i64 sums are associative-commutative-exact — and
  * the mean is the i64 sum divided by the i64 count in IEEE double
  * (identical operands ⇒ identical quotient in both engines; the same
  * rule as Hashing.dotQ).
  */
object Centroids {

  /** Per-term fixed-point scale; sums stay far below 2^53 even at 10^9
    * unit-norm vectors per label. */
  val Scale = 1e6

  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    centroidsOf(Tables.embeddings(spark, dir), "label")

  /** Core of X36 over any frame with a group column and an
    * `embedding: array<float>` column; test seam.
    */
  def centroidsOf(vecs: DataFrame, groupCol: String): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    vecs
      .select(col(groupCol), posexplode($"embedding").as(Seq("dim", "v")))
      .select(col(groupCol), $"dim".cast("long").as("dim"),
        floor($"v".cast("double") * Scale).cast("long").as("q"))
      .groupBy(col(groupCol), $"dim")
      .agg(count(lit(1)).as("n_vectors"), sum($"q").as("sum_q"))
      .withColumn("mean_q", $"sum_q".cast("double") / $"n_vectors")
      .orderBy(col(groupCol), $"dim")
  }

  val labelCentroidsSql: String =
    s"""WITH e AS (
       |  SELECT label, i - 1 AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * ${Scale}) AS BIGINT) AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i))
       |SELECT label, CAST(dim AS BIGINT) AS dim,
       |       count(*) AS n_vectors,
       |       CAST(sum(q) AS BIGINT) AS sum_q,
       |       CAST(sum(q) AS DOUBLE) / count(*) AS mean_q
       |FROM e
       |GROUP BY label, dim
       |ORDER BY label, dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x36_label_centroids" -> labelCentroids _)

  val oracles: Map[String, String] = Map(
    "x36_label_centroids" -> labelCentroidsSql)
}
