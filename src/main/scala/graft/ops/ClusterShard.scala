package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X83 — cluster-aware shard assignment: every document lands in a
  * deterministic output shard, with the constraint that all members of
  * a near-dup cluster (the X18 connected components) land in the SAME
  * shard. The layout step between dedup and training-data export: with
  * cluster-at-one-shard placement, canonical selection / cross-epoch
  * sampling can run shard-locally (no cross-shard coordination), and a
  * downstream consumer that processes shards independently can never
  * emit two near-duplicates into different workers' batches.
  *
  * Determinism: `shard = md5Long40(cluster_id ‖ ":cs") % NumShards` —
  * the same engine-portable 40-bit hash the X42 epoch shuffle uses, so
  * the oracle reproduces placement bit-exactly. Singleton docs hash on
  * their own id (their cluster_id); the constraint is structural — one
  * hash input per cluster — rather than enforced after the fact.
  *
  * Scale shape: everything beyond the X18 label fixpoint (already
  * per-round localCheckpoint'd, node space bounded by the pair set) is
  * a doc-keyed left join plus a stateless hash projection — no new
  * exchange. Shard balance comes from hashing cluster ids, so a single
  * mega-cluster is visible (not silently split); the is_clustered flag
  * and the per-shard counts downstream consumers derive make that
  * audit one aggregation away.
  */
object ClusterShard {

  val NumShards = 8

  def clusterShards(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared memoized x18 fixpoint result — shard layout is a POLICY
    // read of the persisted cluster artifact, not a fresh graph solve
    val labels = CorpusIndex.ccLabels(spark, dir)
    Tables.documents(spark, dir)
      .join(labels, $"doc_id" === $"doc", "left")
      .select($"doc_id",
        coalesce($"label", $"doc_id").as("cluster_id"),
        $"label".isNotNull.as("is_clustered"))
      .withColumn("shard",
        Hashing.md5Long40(
          concat($"cluster_id".cast("string"), lit(":cs"))) % NumShards)
      .orderBy($"doc_id")
  }

  val clusterShardsSql: String =
    s"""WITH RECURSIVE ${Dedup.ccLabelCtes}
       |SELECT doc_id,
       |       coalesce(c.cluster_id, doc_id) AS cluster_id,
       |       (c.doc IS NOT NULL) AS is_clustered,
       |       ${Hashing.sqlMd5Long40(
              "CAST(coalesce(c.cluster_id, doc_id) AS VARCHAR) || ':cs'")}
       |         % $NumShards AS shard
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x83_cluster_shards" -> clusterShards _)

  val oracles: Map[String, String] = Map(
    "x83_cluster_shards" -> clusterShardsSql)
}
