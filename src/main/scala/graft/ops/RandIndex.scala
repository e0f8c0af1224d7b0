package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X121 — exact clustering-agreement audit (Rand / adjusted Rand):
  * how well the geometric clustering (X70's nearest-centroid
  * assignment) recovers the declared `label` partition — the
  * label-quality / cluster-validity check behind clustering-based
  * curation (X70 flags individual strays via `is_own`; X121 scores the
  * WHOLE partition agreement, pair-by-pair, in one number with its
  * chance-corrected form; X100 audits ANN recall, X121 audits what the
  * clusters mean).
  *
  * Exactness — everything is pair counting, so everything is integer:
  * with contingency cells n_kc (cluster k × label c), cluster sizes
  * a_k, label sizes b_c, N points:
  *
  *   a  = Σ C(n_kc,2)  (agreeing same-same pairs)
  *   pc = Σ C(a_k,2),  pl = Σ C(b_c,2),  T = C(N,2)
  *   RI  = (T − pc − pl + 2a) / T
  *   ARI = 2·(T·a − pc·pl) / (T·(pc+pl) − 2·pc·pl)
  *
  * (the ×2 clears the (pc+pl)/2 expected-index term so the fraction
  * stays integral when pc+pl is odd). Every C(n,2) = n·(n−1) div 2 is
  * exact (the product is even); i64 bounds: T·a and pc·pl ≤ T² = N⁴/4
  * — safe to N ≈ 7.8·10⁴ vectors; a larger corpus scores per stratum
  * (the X106 grouping knob). ari_den = 0 (degenerate partitions —
  * e.g. everything in one cluster AND one label) defines ARI = 0.
  * One IEEE division each for the float forms.
  *
  * Scale shape: the contingency is one (cluster, label) count
  * aggregate over X70's map-only assignment (broadcast centroids — no
  * corpus shuffle beyond the cell agg); sizes re-aggregate the CELLS
  * (#clusters·#labels rows), never the corpus twice; the four scalar
  * aggregates cross-join as 1-row broadcasts. Output is ONE row.
  *
  * Reference scope: no clustering in the reference; engine extension
  * (SURVEY §2.5, the X70/X71/X100 cluster-quality family).
  */
object RandIndex {

  def clusterLabelAgreement(spark: SparkSession, dir: String): DataFrame =
    agreementOf(Assign.centroidAssignOf(Tables.embeddings(spark, dir))
      .select(col("nearest_label").as("k"), col("label").as("c")))

  /** Core of X121 over any (k, c) partition-pair frame; test seam. */
  private[graft] def agreementOf(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val cells = pairs.groupBy($"k", $"c").agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val a = cells.agg(
      expr("sum(cnt * (cnt - 1) div 2)").as("pairs_both"),
      count(lit(1)).as("n_cells"))
    val pc = cells.groupBy($"k").agg(sum($"cnt").as("sz"))
      .agg(expr("sum(sz * (sz - 1) div 2)").as("pairs_cluster"),
        count(lit(1)).as("n_clusters"))
    val pl = cells.groupBy($"c").agg(sum($"cnt").as("sz"))
      .agg(expr("sum(sz * (sz - 1) div 2)").as("pairs_label"),
        count(lit(1)).as("n_labels"))
    val tot = cells.agg(sum($"cnt").as("n"))
      .select($"n", expr("n * (n - 1) div 2").as("pairs_total"))
    tot.crossJoin(a).crossJoin(pc).crossJoin(pl)
      .select($"n", $"n_clusters", $"n_labels",
        $"pairs_both", $"pairs_cluster", $"pairs_label", $"pairs_total",
        ($"pairs_total" - $"pairs_cluster" - $"pairs_label" +
          lit(2L) * $"pairs_both").as("ri_num"),
        $"pairs_total".as("ri_den"),
        (lit(2L) * ($"pairs_total" * $"pairs_both" -
          $"pairs_cluster" * $"pairs_label")).as("ari_num"),
        ($"pairs_total" * ($"pairs_cluster" + $"pairs_label") -
          lit(2L) * $"pairs_cluster" * $"pairs_label").as("ari_den"))
      .withColumn("ri_q",
        when($"ri_den" === 0, lit(0.0))
          .otherwise($"ri_num".cast("double") / $"ri_den".cast("double")))
      .withColumn("ari_q",
        when($"ari_den" === 0, lit(0.0))
          .otherwise($"ari_num".cast("double") / $"ari_den".cast("double")))
  }

  val clusterLabelAgreementSql: String =
    s"""WITH ${Assign.centCtes},
       |pr AS (SELECT c_label AS k, label AS c FROM rk WHERE rk = 1),
       |cells AS (SELECT k, c, count(*) AS cnt FROM pr GROUP BY 1, 2),
       |a AS (SELECT sum(cnt * (cnt - 1) // 2) AS pairs_both,
       |             count(*) AS n_cells FROM cells),
       |pc AS (SELECT sum(sz * (sz - 1) // 2) AS pairs_cluster,
       |             count(*) AS n_clusters
       |       FROM (SELECT k, sum(cnt) AS sz FROM cells GROUP BY k)),
       |pl AS (SELECT sum(sz * (sz - 1) // 2) AS pairs_label,
       |             count(*) AS n_labels
       |       FROM (SELECT c, sum(cnt) AS sz FROM cells GROUP BY c)),
       |tot AS (SELECT n, n * (n - 1) // 2 AS pairs_total
       |        FROM (SELECT sum(cnt) AS n FROM cells))
       |SELECT CAST(n AS BIGINT) AS n,
       |       CAST(n_clusters AS BIGINT) AS n_clusters,
       |       CAST(n_labels AS BIGINT) AS n_labels,
       |       CAST(pairs_both AS BIGINT) AS pairs_both,
       |       CAST(pairs_cluster AS BIGINT) AS pairs_cluster,
       |       CAST(pairs_label AS BIGINT) AS pairs_label,
       |       CAST(pairs_total AS BIGINT) AS pairs_total,
       |       CAST(pairs_total - pairs_cluster - pairs_label
       |              + 2 * pairs_both AS BIGINT) AS ri_num,
       |       CAST(pairs_total AS BIGINT) AS ri_den,
       |       CAST(2 * (pairs_total * pairs_both
       |              - pairs_cluster * pairs_label) AS BIGINT) AS ari_num,
       |       CAST(pairs_total * (pairs_cluster + pairs_label)
       |              - 2 * pairs_cluster * pairs_label AS BIGINT) AS ari_den,
       |       CASE WHEN pairs_total = 0 THEN 0.0
       |            ELSE CAST(pairs_total - pairs_cluster - pairs_label
       |                        + 2 * pairs_both AS DOUBLE)
       |                   / CAST(pairs_total AS DOUBLE) END AS ri_q,
       |       CASE WHEN pairs_total * (pairs_cluster + pairs_label)
       |              - 2 * pairs_cluster * pairs_label = 0 THEN 0.0
       |            ELSE CAST(2 * (pairs_total * pairs_both
       |                        - pairs_cluster * pairs_label) AS DOUBLE)
       |                   / CAST(pairs_total * (pairs_cluster + pairs_label)
       |                        - 2 * pairs_cluster * pairs_label AS DOUBLE)
       |            END AS ari_q
       |FROM tot CROSS JOIN a CROSS JOIN pc CROSS JOIN pl""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x121_cluster_label_agreement" -> clusterLabelAgreement _)

  val oracles: Map[String, String] = Map(
    "x121_cluster_label_agreement" -> clusterLabelAgreementSql)
}
