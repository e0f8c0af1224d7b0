package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X95 — k-core decomposition (fixed k = [[CoreK]]) of the collocation
  * graph: iteratively peel nodes whose degree within the surviving
  * subgraph is < k until stable; what remains is the maximal subgraph
  * where every node keeps ≥ k neighbors — the densest-region extraction
  * behind topic-core vocabulary selection and graph-cleaning before
  * community detection (X81's triangles say how CLUMPED a neighborhood
  * is; the k-core says what survives when the fringe is stripped).
  *
  * Determinism without a data-dependent loop count: peeling is MONOTONE
  * (each round's node set is a subset of the last) and IDEMPOTENT past
  * the fixpoint, so the engine runs exactly [[Rounds]] rounds and the
  * DuckDB oracle unrolls the same [[Rounds]] — bit-equal by
  * construction at ANY scale, while KCoreSpec separately proves the
  * fixpoint lands well inside the margin (the X84 unrolled-oracle
  * pattern, applied to a shrinking rather than value-iterating
  * recursion). A wrong margin can therefore never produce a silent
  * wrong answer — both sides compute the same truncation.
  *
  * Scale shape: the node frame is vocabulary-bounded (≪ edges) and
  * broadcast into each round's two semi-joins; per round the only
  * data-moving work is one keyed degree count over the surviving edge
  * set, with `localCheckpoint` pinning lineage flat (the X18/X84 loop
  * discipline). Rounds is a compile-time constant, not a convergence
  * poll — no driver-side `count()` per round. Edges come from the
  * shared memoized [[CorpusIndex.collocationEdges]] (one tokenize +
  * pair-count pass per session, shared with X81/X84).
  *
  * Reference scope: no graph ops in the reference; engine extension
  * (SURVEY §2.5 graph family).
  */
object KCore {

  val CoreK = 3
  val Rounds = 6

  def kCore(spark: SparkSession, dir: String): DataFrame =
    kCoreFromEdges(CorpusIndex.collocationEdges(spark, dir))

  /** Core of X95 over any (u, v) canonical undirected edge frame; test
    * seam. Returns the [[Rounds]]-round peel's survivors with their
    * degree inside the surviving subgraph.
    */
  private[graft] def kCoreFromEdges(edgesIn: DataFrame): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    val edges = edgesIn
    def degreesWithin(nodes: DataFrame): DataFrame = {
      val kept = edges
        .join(broadcast(nodes.select($"n".as("u"))), Seq("u"), "left_semi")
        .join(broadcast(nodes.select($"n".as("v"))), Seq("v"), "left_semi")
      kept.select($"u".as("n")).unionAll(kept.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
    }
    var nodes = edges.select($"u".as("n"))
      .unionAll(edges.select($"v".as("n"))).distinct()
    for (_ <- 1 to Rounds) {
      nodes = degreesWithin(nodes)
        .filter($"deg" >= CoreK).select($"n")
        .localCheckpoint()
    }
    degreesWithin(nodes)
      .select($"n".as("w"), $"deg".as("core_deg"))
      .orderBy($"w")
  }

  /** Fixpoint probe for the spec: the node count after each of the
    * [[Rounds]] peels (a run has converged once two consecutive counts
    * agree).
    */
  private[graft] def peelCounts(edgesIn: DataFrame): Seq[Long] = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    val edges = edgesIn
    var nodes = edges.select($"u".as("n"))
      .unionAll(edges.select($"v".as("n"))).distinct()
    (1 to Rounds).map { _ =>
      val kept = edges
        .join(nodes.select($"n".as("u")), Seq("u"), "left_semi")
        .join(nodes.select($"n".as("v")), Seq("v"), "left_semi")
      nodes = kept.select($"u".as("n")).unionAll(kept.select($"v".as("n")))
        .groupBy($"n").agg(count(lit(1)).as("deg"))
        .filter($"deg" >= CoreK).select($"n")
        .localCheckpoint()
      nodes.count()
    }
  }

  /** Every per-round CTE is MATERIALIZED: each round references the
    * previous one twice, so DuckDB's default CTE *inlining* would
    * expand the [[Rounds]]-deep chain into 2^[[Rounds]] copies of the
    * whole tokenize-and-count subtree (and as many parquet re-opens).
    */
  val kCoreSql: String = {
    val rounds = (1 to Rounds).map { r =>
      val prev = if (r == 1) "r0" else s"r${r - 1}"
      s"""e$r AS MATERIALIZED (
         |  SELECT e.u, e.v FROM em e
         |  JOIN $prev a ON e.u = a.n
         |  JOIN $prev b ON e.v = b.n),
         |r$r AS MATERIALIZED (
         |  SELECT n FROM (
         |    SELECT u AS n FROM e$r UNION ALL SELECT v FROM e$r)
         |  GROUP BY n HAVING count(*) >= $CoreK)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Triangles.edgeCtesSql},
       |em AS MATERIALIZED (SELECT u, v FROM edges),
       |r0 AS MATERIALIZED (
       |  SELECT DISTINCT n FROM (
       |    SELECT u AS n FROM em UNION ALL SELECT v FROM em)),
       |$rounds,
       |efin AS (
       |  SELECT e.u, e.v FROM em e
       |  JOIN r$Rounds a ON e.u = a.n
       |  JOIN r$Rounds b ON e.v = b.n)
       |SELECT n AS w, CAST(count(*) AS BIGINT) AS core_deg FROM (
       |  SELECT u AS n FROM efin UNION ALL SELECT v FROM efin)
       |GROUP BY n
       |ORDER BY w""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x95_kcore" -> kCore _)

  val oracles: Map[String, String] = Map(
    "x95_kcore" -> kCoreSql)
}
