package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X67 — quality-aware canonical selection: inside every near-dup
  * cluster (x18's connected components), keep the HIGHEST-QUALITY
  * member (x10's score) instead of x18's lowest-id convention — the
  * policy layer that turns cluster labels into the dedup decision a
  * training corpus actually wants ("drop the worse copies", not "drop
  * the newer copies"). Ties break on doc_id, so the choice is total
  * and deterministic.
  *
  * Composition, not recomputation: cluster labels come from the same
  * min-label-propagation CC (driver-free, per-round keyed join+agg),
  * the score is the row-local x10 formula, and the selection is one
  * cluster-partitioned window (count + row_number over (score DESC,
  * doc_id)) — cluster-sized state, never global. The oracle composes
  * the same two published CTE chains (ccLabelCtes + qualityScoreCtes)
  * and re-ranks independently.
  *
  * Parity: the score is the identical IEEE expression both engines
  * (proved by x10's gate), so ordering by it is portable; everything
  * else is exact integers and CASE.
  */
object QualityDedup {

  def qualityCanonical(spark: SparkSession, dir: String): DataFrame =
    // shared memoized x18 fixpoint result — canonical selection is a
    // policy pass over the persisted cluster artifact
    qualityCanonicalWith(Tables.documents(spark, dir),
      CorpusIndex.ccLabels(spark, dir))

  /** Core of X67 over any (doc_id, text) frame (ScaleBench seam). */
  private[graft] def qualityCanonicalOf(docs: DataFrame): DataFrame = {
    val sh = Dedup.shinglesOf(docs).cache()
    qualityCanonicalWith(docs, Dedup.connectedComponents(
      Dedup.ngramPairsFrom(sh).select(col("doc_a"), col("doc_b"))))
  }

  /** X67 policy core over a pre-resolved (doc, label) cluster table. */
  private[graft] def qualityCanonicalWith(docs: DataFrame, labels: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = Text.qualityOf(docs)
      .select($"doc_id", $"quality_score")

    val byCluster = Window.partitionBy($"cluster_id")
    scored
      .join(labels, $"doc_id" === $"doc", "left")
      .select($"doc_id",
        coalesce($"label", $"doc_id").as("cluster_id"), $"quality_score")
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("rk", row_number().over(
        byCluster.orderBy($"quality_score".desc, $"doc_id".asc)))
      .select($"doc_id", $"cluster_id", $"cluster_size", $"quality_score",
        ($"rk" === 1).as("is_survivor"),
        when($"rk" === 1, "keep").otherwise("drop").as("action"))
      .orderBy($"doc_id")
  }

  val qualityCanonicalSql: String =
    s"""WITH RECURSIVE ${Dedup.ccLabelCtes},
       |${Text.qualityScoreCtes},
       |labeled AS (
       |  SELECT s.doc_id,
       |         coalesce(c.cluster_id, s.doc_id) AS cluster_id,
       |         s.quality_score
       |  FROM q_score s LEFT JOIN comp c ON s.doc_id = c.doc),
       |ranked AS (
       |  SELECT doc_id, cluster_id, quality_score,
       |         count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |         row_number() OVER (PARTITION BY cluster_id
       |           ORDER BY quality_score DESC, doc_id ASC) AS rk
       |  FROM labeled)
       |SELECT doc_id, cluster_id, cluster_size, quality_score,
       |       (rk = 1) AS is_survivor,
       |       CASE WHEN rk = 1 THEN 'keep' ELSE 'drop' END AS action
       |FROM ranked
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x67_quality_canonical" -> qualityCanonical _)

  val oracles: Map[String, String] = Map(
    "x67_quality_canonical" -> qualityCanonicalSql)
}
