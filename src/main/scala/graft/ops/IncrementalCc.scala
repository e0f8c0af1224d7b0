package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X78 — incremental duplicate-cluster maintenance: merge a NEW batch's
  * near-dup pairs into EXISTING connected-component labels without
  * recomputing the full graph — the production shape of dedup-at-ingest
  * at 100 TB, where the corpus clustering (x18) is a persisted artifact
  * and every crawl increment must update it, not rebuild it.
  *
  * Algorithm — component contraction: every existing component is
  * already summarized by its label (= min doc_id in the component, the
  * x18 invariant), so the merge never touches member docs. Each new
  * edge's endpoints are mapped to their existing label if they have one
  * (else themselves), producing a CONTRACTED edge list whose node space
  * is {touched existing labels} ∪ {new batch docs} — proportional to
  * the BATCH, never the corpus. One connected-components pass over that
  * tiny graph ([[Dedup.connectedComponents]], the same fixpoint kernel)
  * yields the merged labels; existing docs then relabel through a
  * single keyed join on their old label — only members of touched
  * components get new ids, untouched components never appear in the
  * join's build side at all.
  *
  * Correctness (the oracle proves it, hash-exactly): contracting
  * connected subgraphs preserves the component partition, and since
  * every existing label is the min of its members, the min over
  * contracted node ids equals the min over the merged component's
  * docs — so the incremental result is IDENTICAL to a from-scratch CC
  * over all pairs. The DuckDB oracle is exactly that full recompute
  * (recursive-CTE transitive closure over the complete pair graph),
  * plus an even-only closure to derive each doc's origin.
  *
  * The existing/new split is doc_id parity (the x56 convention: even =
  * indexed corpus, odd = arriving batch); in production the same plan
  * keys off a snapshot boundary, the existing labels come from the
  * persisted x18 artifact, and the new-edge feed is x56's asymmetric
  * screen (batch×existing + batch×batch candidates only — x77's
  * snapshot diff identifies the changed set). `origin` reports the
  * maintenance action per doc: `new` (batch member), `relabeled`
  * (existing doc whose component changed), `kept`.
  */
object IncrementalCc {

  def incrementalClusters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared memoized pair stream (no sort — the even/odd split and the
    // contraction joins don't care about pair order)
    val pairs = CorpusIndex.ngramPairs(spark, dir).select($"doc_a", $"doc_b")
    incrementalClustersOf(Tables.documents(spark, dir), pairs)
  }

  /** Core of X78 over any docs frame + qualifying near-dup pair list
    * (doc_a < doc_b); test/scale seam.
    */
  private[graft] def incrementalClustersOf(docs: DataFrame,
      pairs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val evenPairs = pairs.filter($"doc_a" % 2 === 0 && $"doc_b" % 2 === 0)
    val newPairs = pairs.filter($"doc_a" % 2 === 1 || $"doc_b" % 2 === 1)
    // simulated persisted state: the existing corpus's x18 labels
    val existing = Dedup.connectedComponents(evenPairs)
    mergeInto(docs, existing, newPairs)
  }

  /** The maintenance kernel: existingLabels = persisted (doc, label)
    * component state (label = min member id), newEdges = this batch's
    * qualifying pairs. Work is proportional to |newEdges| + touched
    * components.
    */
  private[graft] def mergeInto(docs: DataFrame, existingLabels: DataFrame,
      newEdges: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // contract: endpoint -> its existing component label, else itself.
    // The label side of each join is bounded by the touched components
    // (broadcast-able in production; left as a keyed join so AQE picks
    // broadcast when the batch is small).
    val contractedEdges = newEdges
      .join(existingLabels.select($"doc".as("doc_a"), $"label".as("la")),
        Seq("doc_a"), "left")
      .join(existingLabels.select($"doc".as("doc_b"), $"label".as("lb")),
        Seq("doc_b"), "left")
      .select(coalesce($"la", $"doc_a").as("doc_a"),
        coalesce($"lb", $"doc_b").as("doc_b"))
      .filter($"doc_a" =!= $"doc_b") // within-component batch edges drop out
    val merged = Dedup.connectedComponents(contractedEdges)
      .select($"doc".as("node"), $"label".as("merged"))
    // final label: doc -> its contracted node (old label or itself) ->
    // that node's merged label if its component was touched
    val byCluster = org.apache.spark.sql.expressions.Window
      .partitionBy($"cluster_id")
    docs.select($"doc_id")
      .join(existingLabels.select($"doc".as("doc_id"), $"label"),
        Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"label", $"doc_id").as("node"))
      .join(merged, Seq("node"), "left")
      .select($"doc_id", coalesce($"merged", $"node").as("cluster_id"),
        $"node")
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .select($"doc_id", $"cluster_id", $"cluster_size",
        ($"doc_id" === $"cluster_id").as("is_canonical"),
        when($"doc_id" % 2 === 1, lit("new"))
          .when($"cluster_id" =!= $"node", lit("relabeled"))
          .otherwise(lit("kept")).as("origin"))
      .orderBy($"doc_id")
  }

  /** Full-recompute oracle: complete-graph closure for cluster_id (the
    * incremental result must match it exactly), even-only closure for
    * origin.
    */
  val incrementalClustersSql: String =
    s"""WITH RECURSIVE ${Dedup.ccLabelCtes},
       |epairs AS (
       |  SELECT doc_a, doc_b FROM pairs
       |  WHERE doc_a % 2 = 0 AND doc_b % 2 = 0),
       |eedges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM epairs
       |  UNION
       |  SELECT doc_b, doc_a FROM epairs),
       |ereach(a, b) AS (
       |  SELECT a, b FROM eedges
       |  UNION
       |  SELECT r.a, e.b FROM ereach r JOIN eedges e ON r.b = e.a),
       |ecomp AS (
       |  SELECT a AS doc, least(a, min(b)) AS cluster_id
       |  FROM ereach GROUP BY a)
       |SELECT d.doc_id,
       |       coalesce(c.cluster_id, d.doc_id) AS cluster_id,
       |       count(*) OVER (PARTITION BY coalesce(c.cluster_id, d.doc_id))
       |         AS cluster_size,
       |       (d.doc_id = coalesce(c.cluster_id, d.doc_id)) AS is_canonical,
       |       CASE WHEN d.doc_id % 2 = 1 THEN 'new'
       |            WHEN coalesce(c.cluster_id, d.doc_id)
       |                 <> coalesce(e.cluster_id, d.doc_id) THEN 'relabeled'
       |            ELSE 'kept' END AS origin
       |FROM documents d
       |LEFT JOIN comp c ON d.doc_id = c.doc
       |LEFT JOIN ecomp e ON d.doc_id = e.doc
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x78_incremental_cc" -> incrementalClusters _)

  val oracles: Map[String, String] = Map(
    "x78_incremental_cc" -> incrementalClustersSql)
}
