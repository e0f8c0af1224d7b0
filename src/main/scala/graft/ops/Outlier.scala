package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X156 — embedding outlier scores: every vector's diagonal-Mahalanobis
  * distance to the corpus distribution (Σ_d (v_d − μ_d)²/σ²_d over
  * X64's per-dim mean/variance profile) and the top-[[K]] most anomalous
  * vectors — the embedding-space junk detector a curation pass runs
  * BEFORE dedup (corrupt encodes, wrong-modality rows, and adversarial
  * inputs land far from every cell; SemDeDup then wastes no pairs on
  * them). Completes the embedding-quality axis: X64 profiles the
  * DIMENSIONS, X129 flags per-dim outlier VALUES, X156 scores whole
  * VECTORS.
  *
  * Exactness: μ_d and σ²_d are X64's proven chain verbatim (exact
  * i64-quantized sums through DECIMAL(38,0), one double division —
  * identical rationals ⇒ identical IEEE doubles in both engines); each
  * per-dim contribution (v_d − μ_d)²/σ²_d is then a fixed-order double
  * expression of identical operands, and the cross-dim SUM — the one
  * place float order could creep in — is i64-quantized per term
  * (floor(contrib·1e6)) and summed exactly, so partition order cannot
  * matter; score = one final cast. Zero-variance dims contribute 0 by
  * explicit guard in both engines (a constant dim carries no anomaly
  * signal). Top-K rank carries the (score_q DESC, vec_id ASC) total
  * tie-break.
  *
  * Scale shape: the per-dim profile is ONE map-side-combined (dim)
  * aggregate collapsed to |dims| rows and BROADCAST (the X70
  * discipline); scoring is a map-only pass (explode + broadcast join +
  * one vec-keyed partial-agg sum); the top-K cut is a global
  * TakeOrderedAndProject at K rows, not a sort.
  *
  * Reference scope: no embedding analytics in the reference; engine
  * extension (SURVEY §2.5, the X64/X129/X145 embedding-quality family).
  */
object Outlier {

  val K = 20

  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    outliersOf(Tables.embeddings(spark, dir))

  /** Core of X156 over any (vec_id, label, embedding) frame. */
  private[graft] def outliersOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val stats = EmbedProfile.profileOf(e.select($"embedding"))
      .select($"dim", $"mean_v", $"var_v")
    val scored = e.select($"vec_id", $"label",
        posexplode($"embedding").as(Seq("dim", "v")))
      .select($"vec_id", $"label", $"dim".cast("long").as("dim"),
        $"v".cast("double").as("v"))
      .join(broadcast(stats), Seq("dim"))
      // per-dim contribution, i64-quantized so the cross-dim sum is
      // exact in any order; constant dims are guarded to 0
      .withColumn("t", when($"var_v" <= 0.0, lit(0L)).otherwise(
        floor(($"v" - $"mean_v") * ($"v" - $"mean_v") / $"var_v"
          * lit(1e6)).cast("long")))
      .groupBy($"vec_id", $"label")
      .agg(sum($"t").as("score_q"))
    // global top-K via orderBy+limit (TakeOrderedAndProject — per-task
    // heaps, never a corpus sort or a one-partition window); the rank
    // window then runs over the K = 20 survivors only, so its empty
    // partitionSpec is bounded by construction. WindowExec still logs
    // the all-data-to-one-partition warning for it; round 16 suppressed
    // that by partitioning on a non-foldable constant (vec_id % 1), but
    // the round-16 review rightly called that suppression-by-
    // construction — the plan should stay honest and the EXPECTED
    // warning is silenced at the harness instead (HarnessLog, the
    // WindowExec logger; BASELINE.md §log-hygiene documents it)
    val byScore = Window.orderBy($"score_q".desc, $"vec_id".asc)
    scored.orderBy($"score_q".desc, $"vec_id".asc).limit(K)
      .withColumn("rank", row_number().over(byScore).cast("long"))
      .select($"rank", $"vec_id", $"label",
        ($"score_q".cast("double") / 1e6).as("score"))
      .orderBy($"rank")
  }

  val embeddingOutliersSql: String = {
    val s = Centroids.Scale
    s"""WITH e AS (
       |  SELECT vec_id, label, i - 1 AS dim,
       |         CAST(embedding[i] AS DOUBLE) AS v,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * $s) AS BIGINT)
       |           AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i)),
       |m AS (
       |  SELECT dim, count(*) AS n,
       |         sum(CAST(q AS DECIMAL(38,0))) AS sum_q,
       |         sum(CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0)))
       |           AS sumsq_q
       |  FROM e GROUP BY dim),
       |st AS (
       |  SELECT dim,
       |         CAST(sum_q AS DOUBLE) / (CAST(n AS DOUBLE) * $s)
       |           AS mean_v,
       |         CAST(CAST(n AS DECIMAL(38,0)) * sumsq_q
       |                - sum_q * sum_q AS DOUBLE)
       |           / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * $s * $s)
       |           AS var_v
       |  FROM m),
       |t AS (
       |  SELECT e.vec_id, e.label,
       |         CASE WHEN st.var_v <= 0.0 THEN 0
       |              ELSE CAST(floor((e.v - st.mean_v) * (e.v - st.mean_v)
       |                     / st.var_v * 1e6) AS BIGINT) END AS t
       |  FROM e JOIN st ON e.dim = st.dim),
       |sc AS (
       |  SELECT vec_id, label, sum(t) AS score_q FROM t GROUP BY 1, 2),
       |r AS (
       |  SELECT vec_id, label, score_q,
       |         row_number() OVER (ORDER BY score_q DESC, vec_id ASC)
       |           AS rank
       |  FROM sc)
       |SELECT CAST(rank AS BIGINT) AS rank, vec_id, label,
       |       CAST(score_q AS DOUBLE) / 1e6 AS score
       |FROM r WHERE rank <= $K
       |ORDER BY rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x156_embedding_outliers" -> embeddingOutliers _)

  val oracles: Map[String, String] = Map(
    "x156_embedding_outliers" -> embeddingOutliersSql)
}
