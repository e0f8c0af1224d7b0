package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X103 — common-neighbor link prediction over the shared X44/X81/X95
  * collocation graph: every NON-adjacent vocabulary pair whose
  * neighborhoods overlap in ≥ [[MinCommon]] nodes, scored by the exact
  * neighborhood-Jaccard — the classic structural link predictor
  * ("words that co-occur with the same words are substitutable") behind
  * synonym-candidate mining and taxonomy densification over a training
  * corpus: X81 asks how clumped an existing neighborhood is, X103 asks
  * which MISSING edges the structure implies.
  *
  * Exactness: n_common / deg_u / deg_v are exact i64 counts;
  * `jacc_q = n_common / (deg_u + deg_v − n_common)` (neighborhood
  * union via inclusion–exclusion — u,v non-adjacent, so neither is in
  * the other's neighborhood and the denominator needs no ±1 terms) is
  * ONE IEEE division of identical i64-derived operands in both engines
  * (the b50/X81 idiom).
  *
  * Scale shape: each common-neighbor FACT is one wedge (u—w—v), so the
  * wedge stream IS the information-theoretic input of the count — no
  * orientation trick can shrink it (X81's m^{3/2} bound applies to
  * triangle CLOSURE probes, not to counting every wedge once); what
  * keeps it tractable is that the graph is the [[MinEdge]]-thresholded
  * collocation core (vocabulary-bounded, hub degrees capped by the
  * threshold's df ceiling), wedges flow straight into a map-side
  * partial-combined (u, v) hash-agg with never an all-pairs stage, the
  * [[MinCommon]] floor drops the long weak tail before the join stage,
  * and the adjacency exclusion is a broadcast-able anti-join against
  * the (vocabulary-bounded) edge list. Nothing global but the final
  * oracle-determinism ORDER BY.
  *
  * Reference scope: no graph ops in the reference; engine extension
  * (SURVEY §2.5, the X44/X81/X84/X95/X96 collocation-graph family).
  */
object LinkPredict {

  /** Overlap floor: pairs sharing a single neighbor are noise at any
    * corpus scale; ≥ 2 independent shared contexts is the standard
    * common-neighbor evidence bar.
    */
  val MinCommon = 2

  def linkPredict(spark: SparkSession, dir: String): DataFrame =
    linkPredictFromEdges(CorpusIndex.collocationEdges(spark, dir))

  /** Core of X103 over any (u, v) undirected simple edge frame (u < v
    * canonical, no duplicates); test seam.
    */
  private[graft] def linkPredictFromEdges(edgesIn: DataFrame): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    // edges feed the adjacency expansion, the degree table, and the
    // exclusion anti-join — one materialization
    val edges = edgesIn.localCheckpoint()
    val adj = edges.select($"u".as("n"), $"v".as("nb"))
      .union(edges.select($"v".as("n"), $"u".as("nb")))
    val deg = adj.groupBy($"n").agg(count(lit(1)).as("deg"))
    // each wedge u—w—v generated exactly once (u < v via nb ordering),
    // counted per endpoint pair with map-side partials
    val common = adj.as("a").join(adj.as("b"),
        col("a.n") === col("b.n") && col("a.nb") < col("b.nb"))
      .select(col("a.nb").as("u"), col("b.nb").as("v"))
      .groupBy($"u", $"v").agg(count(lit(1)).as("n_common"))
      .filter($"n_common" >= MinCommon)
    common
      .join(edges, Seq("u", "v"), "left_anti")
      .join(broadcast(deg.select($"n".as("u"), $"deg".as("deg_u"))), "u")
      .join(broadcast(deg.select($"n".as("v"), $"deg".as("deg_v"))), "v")
      .select($"u", $"v", $"deg_u", $"deg_v", $"n_common",
        ($"n_common".cast("double") /
          ($"deg_u" + $"deg_v" - $"n_common").cast("double")).as("jacc_q"))
      .orderBy($"u", $"v")
  }

  val linkPredictSql: String =
    s"""WITH ${Triangles.edgeCtesSql},
       |adj AS (
       |  SELECT u AS n, v AS nb FROM edges
       |  UNION ALL SELECT v, u FROM edges),
       |deg AS (SELECT n, count(*) AS deg FROM adj GROUP BY 1),
       |com AS (
       |  SELECT a.nb AS u, b.nb AS v, count(*) AS n_common
       |  FROM adj a JOIN adj b ON a.n = b.n AND a.nb < b.nb
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $MinCommon),
       |nonadj AS (
       |  SELECT c.u, c.v, c.n_common FROM com c
       |  WHERE NOT EXISTS (
       |    SELECT 1 FROM edges e WHERE e.u = c.u AND e.v = c.v))
       |SELECT c.u, c.v,
       |       CAST(du.deg AS BIGINT) AS deg_u,
       |       CAST(dv.deg AS BIGINT) AS deg_v,
       |       CAST(c.n_common AS BIGINT) AS n_common,
       |       CAST(c.n_common AS DOUBLE)
       |         / CAST(du.deg + dv.deg - c.n_common AS DOUBLE) AS jacc_q
       |FROM nonadj c
       |JOIN deg du ON c.u = du.n
       |JOIN deg dv ON c.v = dv.n
       |ORDER BY u, v""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x103_link_predict" -> linkPredict _)

  val oracles: Map[String, String] = Map(
    "x103_link_predict" -> linkPredictSql)
}
