package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._


/** X84 — deterministic integer PageRank over the collocation graph:
  * damped PageRank (d = 0.85, [[Iters]] fixed power-iteration rounds)
  * on the X44/X81 co-occurrence edge set (canonical skip-gram pairs
  * with corpus count ≥ [[Cooccur.MinPair]], self-loops dropped,
  * symmetrized). The centrality read behind keyword/keyphrase
  * extraction (TextRank is exactly this graph + this iteration) and
  * vocabulary pruning by graph importance rather than raw frequency —
  * a hub term with many distinct strong neighbors outranks a term
  * that is merely frequent inside one boilerplate phrase.
  *
  * Exactness: ranks live in integer units of 1/[[Scale]] and every
  * step is i64 arithmetic — `r0 = Scale div n`, each round
  * `r' = (15·(Scale div n)) div 100 + (85·Σ(r div deg)) div 100` —
  * with `div` truncating integral division in BOTH engines (Spark
  * `div`, DuckDB `//`; all operands nonnegative). There is no
  * floating-point accumulation anywhere, so the usual "PageRank sums
  * doubles in nondeterministic order" oracle blocker disappears; the
  * one IEEE division producing `rank_q` divides identical i64
  * operands. Mass lost to truncation is deliberate and identical on
  * both sides (≤ 1 unit per edge per round out of 1e12); the
  * conservation bound is pinned in PageRankSpec.
  *
  * Scale shape: the graph is VOCABULARY-bounded (pairs already
  * thresholded by count ≥ MinPair), orders of magnitude smaller than
  * the token stream that generated it — the one heavy pass is the
  * X44-style row-local pair expansion + count (shared verbatim with
  * X81 via [[Triangles.edgesOf]]), after which [[Iters]] rounds each
  * shuffle only (node, rank) ⋈ edges, i.e. vocab-sized frames. Edges
  * and degrees cache across rounds; the node-count scalar rides an
  * in-plan one-row broadcast (x37 idiom — no driver action). At
  * 100 TB the iteration cost is unchanged (graph size is vocab-bound,
  * not corpus-bound); only the pair-count pass scales with data, and
  * it is the same map-side-partial aggregate x44 already runs. A
  * fixed iteration count (not convergence-tested) is what keeps the
  * plan static and the oracle expressible; three damped rounds on a
  * diameter-bounded collocation graph is the TextRank regime.
  */
object PageRank {

  val Iters = 3
  val Scale = 1000000000000L // ranks in units of 1e-12

  def pagerank(spark: SparkSession, dir: String): DataFrame =
    pagerankFromEdges(CorpusIndex.collocationEdges(spark, dir))

  /** Core of X84 over any (u, v) undirected simple edge frame (u < v
    * canonical, no duplicates — [[Triangles.edgesOf]]'s contract);
    * test seam.
    */
  private[graft] def pagerankFromEdges(und: DataFrame): DataFrame = {
    val spark = und.sparkSession
    import spark.implicits._
    // symmetrize: the directed edge list of the undirected graph
    val edges = und.select($"u".as("src"), $"v".as("dst"))
      .union(und.select($"v".as("src"), $"u".as("dst")))
      .localCheckpoint() // vocab-bounded; reused every round
    // symmetrized ⇒ out-degree ≥ 1 everywhere: no dangling-mass term,
    // and the per-round groupBy(dst) reaches every node
    val deg = edges.groupBy($"src".as("node"))
      .agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val nRow = deg.agg(count(lit(1)).as("n"))
    var r = deg.select($"node").crossJoin(broadcast(nRow))
      .selectExpr("node", s"$Scale div n AS r")
    for (_ <- 1 to Iters) {
      r = r.join(deg, "node")
        .join(edges, $"node" === $"src")
        .select($"dst", expr("r div d").as("contrib"))
        .groupBy($"dst".as("node"))
        .agg(sum($"contrib").as("s"))
        .crossJoin(broadcast(nRow))
        .selectExpr("node",
          s"(15 * ($Scale div n)) div 100 + (85 * s) div 100 AS r")
    }
    r.join(deg, "node")
      .select($"node".as("term"), $"r".as("rank_i"), $"d".as("deg"))
      .withColumn("rank_q",
        $"rank_i".cast("double") / lit(Scale).cast("double"))
      .orderBy($"term")
  }

  val pagerankSql: String = {
    // one unrolled CTE per power-iteration round: the fixed iteration
    // count is what keeps this expressible without recursive-aggregate
    // support; each rN mirrors the Spark loop body token for token
    val round = (prev: String, out: String) =>
      s"""$out AS (
         |  SELECT e.dst AS node,
         |         (15 * ($Scale // nn.n)) // 100
         |           + (85 * CAST(sum(p.r // dg.d) AS BIGINT)) // 100 AS r
         |  FROM $prev p
         |  JOIN dg ON p.node = dg.node
         |  JOIN ed e ON p.node = e.src, nn
         |  GROUP BY e.dst, nn.n)"""
    s"""WITH t AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, generate_subscripts(w, 1) AS pos,
       |         unnest(w) AS term
       |  FROM t),
       |cw AS (
       |  SELECT least(a.term, b.term) AS w1, greatest(a.term, b.term) AS w2
       |  FROM tok a JOIN tok b
       |    ON a.doc_id = b.doc_id
       |   AND b.pos > a.pos AND b.pos <= a.pos + ${Cooccur.WindowW}
       |  GROUP BY 1, 2
       |  HAVING count(*) >= ${Cooccur.MinPair}),
       |ed AS (
       |  SELECT w1 AS src, w2 AS dst FROM cw WHERE w1 <> w2
       |  UNION ALL
       |  SELECT w2, w1 FROM cw WHERE w1 <> w2),
       |dg AS (SELECT src AS node, count(*) AS d FROM ed GROUP BY 1),
       |nn AS (SELECT count(*) AS n FROM dg),
       |r0 AS (SELECT node, $Scale // nn.n AS r FROM dg, nn),
       |${round("r0", "r1").stripMargin},
       |${round("r1", "r2").stripMargin},
       |${round("r2", "r3").stripMargin}
       |SELECT dg.node AS term, r3.r AS rank_i, dg.d AS deg,
       |       CAST(r3.r AS DOUBLE) / CAST($Scale AS DOUBLE) AS rank_q
       |FROM r3 JOIN dg ON r3.node = dg.node
       |ORDER BY dg.node""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x84_pagerank" -> pagerank _)

  val oracles: Map[String, String] = Map(
    "x84_pagerank" -> pagerankSql)
}
