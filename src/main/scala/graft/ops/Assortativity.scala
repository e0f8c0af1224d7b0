package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X123 — exact degree assortativity of the collocation graph (Newman
  * 2002): do high-degree words co-occur with high-degree words? — the
  * one-number mixing diagnostic that tells the graph family what kind
  * of graph it is working on (assortative networks shatter into
  * degree-stratified cores — X95's peel finds deep cores; disassortative
  * hub-and-spoke graphs are where X84's rank concentrates and skew
  * salting matters; X81 measures local closure, X123 measures global
  * mixing).
  *
  * Exactness — Pearson over the 2M directed stubs, cleared to integers:
  * each undirected edge contributes both (deg u, deg v) and (deg v,
  * deg u), so Σx = Σy and Σx² = Σy² by construction and the correlation
  * collapses to the single exact fraction
  *
  *   r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²),   n = 2M
  *
  * — numerator and denominator are i64 sums (n·Σxy ≤ 4M²·V²: safe to
  * M ≈ 10⁶ edges at V ≤ 10³ max degree; beyond that the same query runs
  * per community/shard), ONE IEEE division for the float. A regular
  * graph (all degrees equal) has den = 0 and defines r = 0.
  *
  * Scale shape: degrees are one count aggregate over the edge list; the
  * stub frame is edges ∪ edges-swapped joined against the BROADCAST
  * degree table (vocab-bounded); one scalar aggregate after. The corpus
  * is touched once inside the shared memoized
  * [[CorpusIndex.collocationEdges]] (the X81/X95/X103 seam).
  *
  * Reference scope: no graph ops in the reference; engine extension
  * (SURVEY §2.5, the X81/X84/X95/X103 graph family).
  */
object Assortativity {

  def degreeAssortativity(spark: SparkSession, dir: String): DataFrame =
    assortativityOf(CorpusIndex.collocationEdges(spark, dir))

  /** Core of X123 over any canonical (u, v) edge frame; test seam. */
  private[graft] def assortativityOf(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.localCheckpoint()
    val deg = e.select($"u".as("n"))
      .union(e.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
    val stubs = e.select($"u".as("a"), $"v".as("b"))
      .union(e.select($"v".as("a"), $"u".as("b")))
      .join(broadcast(deg.select($"n".as("a"), $"deg".as("x"))), "a")
      .join(broadcast(deg.select($"n".as("b"), $"deg".as("y"))), "b")
    stubs
      .agg(count(lit(1)).as("n_stubs"),
        (count(lit(1)) * sum($"x" * $"y") - sum($"x") * sum($"x"))
          .as("r_num"),
        (count(lit(1)) * sum($"x" * $"x") - sum($"x") * sum($"x"))
          .as("r_den"))
      .select(($"n_stubs" / lit(2L)).cast("long").as("n_edges"),
        $"n_stubs", $"r_num", $"r_den",
        when($"r_den" === 0, lit(0.0)).otherwise(
          $"r_num".cast("double") / $"r_den".cast("double")).as("r_q"))
  }

  val degreeAssortativitySql: String =
    s"""WITH ${Triangles.edgeCtesSql},
       |deg AS (
       |  SELECT n, count(*) AS deg
       |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
       |  GROUP BY 1),
       |stubs AS (
       |  SELECT da.deg AS x, db.deg AS y
       |  FROM (SELECT u AS a, v AS b FROM edges
       |        UNION ALL SELECT v, u FROM edges) s
       |  JOIN deg da ON s.a = da.n
       |  JOIN deg db ON s.b = db.n)
       |SELECT CAST(count(*) / 2 AS BIGINT) AS n_edges,
       |       CAST(count(*) AS BIGINT) AS n_stubs,
       |       CAST(count(*) * sum(x * y) - sum(x) * sum(x) AS BIGINT)
       |         AS r_num,
       |       CAST(count(*) * sum(x * x) - sum(x) * sum(x) AS BIGINT)
       |         AS r_den,
       |       CASE WHEN count(*) * sum(x * x) - sum(x) * sum(x) = 0
       |            THEN 0.0
       |            ELSE CAST(count(*) * sum(x * y) - sum(x) * sum(x)
       |                   AS DOUBLE)
       |               / CAST(count(*) * sum(x * x) - sum(x) * sum(x)
       |                   AS DOUBLE) END AS r_q
       |FROM stubs""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x123_degree_assortativity" -> degreeAssortativity _)

  val oracles: Map[String, String] = Map(
    "x123_degree_assortativity" -> degreeAssortativitySql)
}
