package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X81 — triangle counting + local clustering coefficient over the
  * token co-occurrence graph (the X44 edge set: canonical skip-gram
  * pairs with corpus count ≥ [[MinEdge]]). Triangles are the basic
  * cohesion motif: a token whose neighbors also co-occur with each
  * other is a topical hub, not a syntactic connector, and the
  * clustering coefficient `2·tri / (deg·(deg−1))` separates the two —
  * the collocation-graph analysis behind phrase-table pruning and
  * topic-seed selection over a training corpus.
  *
  * Algorithm: DEGREE-ORIENTED wedge join — every undirected edge is
  * oriented from its (deg, node)-smaller endpoint to the larger, each
  * wedge is generated exactly once at its lowest-ordered apex, and a
  * wedge closes into a triangle iff the oriented edge (b → c) exists
  * (orientation consistency makes that single probe sufficient). This
  * is the shape that survives scale: out-degree after orientation is
  * O(√m), so wedge count is bounded by m^{3/2} regardless of hub
  * degree — a plain neighbor self-join on an unoriented hub of degree
  * d generates d² wedges and dies on exactly the skewed nodes a real
  * vocabulary has.
  *
  * Exactness: deg and n_tri are exact i64; `clust_q` is ONE IEEE
  * division of identical i64-derived operands in both engines (the
  * b50/x60 idiom — no rounding step anywhere).
  *
  * Scale shape: the degree table is vocabulary-bounded and broadcast;
  * the only data-moving exchanges are the edge-count aggregation
  * (map-side partials over row-local pair generation — no positional
  * self-join of the token stream), the wedge self-join keyed on the
  * apex, and the closure hash join keyed on (b, c). No cartesian, no
  * global sort except the oracle-determinism final ORDER BY.
  */
object Triangles {

  val WindowW: Int = Cooccur.WindowW
  val MinEdge: Int = Cooccur.MinPair

  def triangleStats(spark: SparkSession, dir: String): DataFrame =
    triangleStatsFromEdges(CorpusIndex.collocationEdges(spark, dir))

  /** Undirected simple edge set (u < v) of the X44 co-occurrence graph
    * over any (doc_id, text) frame; test seam.
    */
  private[graft] def edgesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select(
      split(trim(lower($"text")), "\\s+").as("w"))
    words.select(
        explode(Hashing.skipGramPairs($"w", WindowW, canonical = true))
          .as("p"))
      .groupBy($"p").agg(count(lit(1)).as("c"))
      .filter($"c" >= MinEdge)
      .select(split($"p", " ").getItem(0).as("u"),
        split($"p", " ").getItem(1).as("v"))
      .filter($"u" < $"v")
  }

  /** Core of X81 over any (u, v) undirected simple edge frame (u < v
    * canonical, no duplicates); test seam.
    */
  private[graft] def triangleStatsFromEdges(edgesIn: DataFrame): DataFrame = {
    val spark = edgesIn.sparkSession
    import spark.implicits._
    // edges feed degrees, orientation, and closure — one materialization
    val edges = edgesIn.localCheckpoint()
    val deg = edges.select($"u".as("n"))
      .union(edges.select($"v".as("n")))
      .groupBy($"n").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient each edge toward the (deg, node)-larger endpoint; carry
    // the destination's degree for the wedge ordering
    val uLess = $"du" < $"dv" || ($"du" === $"dv" && $"u" < $"v")
    val oriented = edges
      .join(broadcast(deg.select($"n".as("u"), $"deg".as("du"))), "u")
      .join(broadcast(deg.select($"n".as("v"), $"deg".as("dv"))), "v")
      .select(
        when(uLess, $"u").otherwise($"v").as("src"),
        when(uLess, $"v").otherwise($"u").as("dst"),
        when(uLess, $"dv").otherwise($"du").as("ddeg"))
      .localCheckpoint()
    // each wedge once, at its apex, with (b, c) in orientation order —
    // so {b, c}'s oriented form can only be b → c
    val wedges = oriented.as("o1").join(oriented.as("o2"),
        col("o1.src") === col("o2.src") &&
          (col("o1.ddeg") < col("o2.ddeg") ||
            (col("o1.ddeg") === col("o2.ddeg") &&
              col("o1.dst") < col("o2.dst"))))
      .select(col("o1.src").as("apex"),
        col("o1.dst").as("b"), col("o2.dst").as("c"))
    val triangles = wedges.join(oriented.select($"src".as("b"), $"dst".as("c")),
      Seq("b", "c"))
    val perNode = triangles
      .select(explode(array($"apex", $"b", $"c")).as("n"))
      .groupBy($"n").agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("n"), "left")
      .filter($"deg" >= 2)
      .select($"n".as("w"), $"deg",
        coalesce($"n_tri", lit(0L)).as("n_tri"))
      .withColumn("clust_q",
        (lit(2L) * $"n_tri").cast("double")
          / ($"deg" * ($"deg" - lit(1L))).cast("double"))
      .orderBy($"w")
  }

  /** Shared CTE chain (t, tok, pr, edges) deriving the X44/X81/X95
    * collocation edge set — the SQL analog of [[edgesOf]], reused by the
    * X95 k-core oracle exactly as [[CorpusIndex.collocationEdges]] is
    * shared on the engine side.
    */
  private[graft] val edgeCtesSql: String =
    s"""t AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, generate_subscripts(w, 1) AS pos,
       |         unnest(w) AS term
       |  FROM t),
       |pr AS (
       |  SELECT least(a.term, b.term) AS w1, greatest(a.term, b.term) AS w2
       |  FROM tok a JOIN tok b
       |    ON a.doc_id = b.doc_id
       |   AND b.pos > a.pos AND b.pos <= a.pos + $WindowW),
       |edges AS (
       |  SELECT w1 AS u, w2 AS v
       |  FROM (SELECT w1, w2, count(*) AS c FROM pr GROUP BY 1, 2)
       |  WHERE c >= $MinEdge AND w1 < w2)""".stripMargin

  val triangleStatsSql: String =
    s"""WITH $edgeCtesSql,
       |deg AS (
       |  SELECT n, count(*) AS deg
       |  FROM (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges)
       |  GROUP BY 1),
       |o AS (
       |  SELECT CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
       |              THEN e.u ELSE e.v END AS src,
       |         CASE WHEN du.deg < dv.deg OR (du.deg = dv.deg AND e.u < e.v)
       |              THEN e.v ELSE e.u END AS dst
       |  FROM edges e
       |  JOIN deg du ON e.u = du.n
       |  JOIN deg dv ON e.v = dv.n),
       |od AS (SELECT o.src, o.dst, d.deg AS ddeg
       |       FROM o JOIN deg d ON o.dst = d.n),
       |wed AS (
       |  SELECT o1.src AS apex, o1.dst AS b, o2.dst AS c
       |  FROM od o1 JOIN od o2 ON o1.src = o2.src
       |  WHERE o1.ddeg < o2.ddeg
       |     OR (o1.ddeg = o2.ddeg AND o1.dst < o2.dst)),
       |tr AS (
       |  SELECT apex, b, c
       |  FROM wed JOIN o ON wed.b = o.src AND wed.c = o.dst),
       |pern AS (
       |  SELECT n, count(*) AS n_tri
       |  FROM (SELECT apex AS n FROM tr
       |        UNION ALL SELECT b FROM tr
       |        UNION ALL SELECT c FROM tr)
       |  GROUP BY 1)
       |SELECT d.n AS w, d.deg,
       |       CAST(COALESCE(p.n_tri, 0) AS BIGINT) AS n_tri,
       |       CAST(2 * COALESCE(p.n_tri, 0) AS DOUBLE)
       |         / CAST(d.deg * (d.deg - 1) AS DOUBLE) AS clust_q
       |FROM deg d LEFT JOIN pern p ON d.n = p.n
       |WHERE d.deg >= 2
       |ORDER BY w""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x81_triangle_stats" -> triangleStats _)

  val oracles: Map[String, String] = Map(
    "x81_triangle_stats" -> triangleStatsSql)
}
