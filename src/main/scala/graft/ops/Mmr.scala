package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X122 — MMR diversified re-ranking (maximal marginal relevance,
  * Carbonell & Goldstein 1998): from the query's top-C cosine
  * candidates, greedily select R results maximizing
  * λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s) with λ = ½ — the
  * redundancy-aware final stage of the retrieval family (X3/X68/X69
  * rank by relevance alone and happily return R near-duplicates; MMR
  * is the classic fix, and for a training-data pipeline it is also the
  * anti-redundancy selection rule behind diverse few-shot/eval-set
  * picking). X51's hard negatives mine for contrast; X122 selects for
  * coverage.
  *
  * Determinism: every similarity is the engine-portable cosQ double
  * (exact i64 quantized dots, identical IEEE expression both engines —
  * the X4 license for comparing floats), every argmax carries the
  * (score DESC, vec_id) total tie-break, and the greedy recursion is
  * UNROLLED to R = 4 fixed rounds with the oracle unrolled to the same
  * depth (the X84/X110/X120 fixed-round pattern). Round 1 is the plain
  * relevance top-1 with mmr = rel by convention (empty selected set).
  *
  * Scale shape: the candidate cut is the X3 broadcast-query map-only
  * scan + TakeOrderedAndProject (corpus touched ONCE); everything
  * after operates on C = 12 rows — the C×C pair matrix and the four
  * argmax rounds are driver-plan-composed joins over broadcast-sized
  * frames, corpus-free by construction (the X120 discipline). At
  * warehouse scale C grows with the result page, not the corpus.
  *
  * Reference scope: no retrieval ops in the reference; engine
  * extension (SURVEY §2.5, the X3/X68/X69/X51 retrieval family).
  */
object Mmr {

  /** Candidate pool and selection depths (see scale note). */
  val C = 12
  val R = 4

  def mmrRerank(spark: SparkSession, dir: String): DataFrame =
    mmrOf(Tables.embeddings(spark, dir))

  /** Core of X122 over any (vec_id, embedding) frame — vec_id 0 is the
    * query; test seam. */
  private[graft] def mmrOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    val cand = e.filter($"vec_id" =!= 0).crossJoin(broadcast(q))
      .select($"vec_id", $"embedding",
        cosQ(dotQ($"embedding", $"qe"), dotQ($"embedding", $"embedding"),
          dotQ($"qe", $"qe")).as("rel"))
      .orderBy($"rel".desc, $"vec_id")
      .limit(C)
      .localCheckpoint()
    val scores = cand.select($"vec_id", $"rel")
    val pairs = cand.as("a").join(cand.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("ca"), col("b.vec_id").as("cb"),
        cosQ(dotQ(col("a.embedding"), col("b.embedding")),
          dotQ(col("a.embedding"), col("a.embedding")),
          dotQ(col("b.embedding"), col("b.embedding"))).as("sim"))
      .localCheckpoint()
    var result = scores
      .orderBy($"rel".desc, $"vec_id").limit(1)
      .select(lit(1L).as("sel_rank"), $"vec_id", $"rel",
        $"rel".as("mmr"))
    for (r <- 2 to R) {
      val sel = result.select($"vec_id".as("cb"))
      val next = scores
        .join(result.select($"vec_id"), Seq("vec_id"), "left_anti")
        .join(pairs, $"vec_id" === $"ca")
        .join(sel, Seq("cb"))
        .groupBy($"vec_id", $"rel")
        .agg(max($"sim").as("smax"))
        .select(lit(r.toLong).as("sel_rank"), $"vec_id", $"rel",
          (lit(0.5) * $"rel" - lit(0.5) * $"smax").as("mmr"))
        .orderBy($"mmr".desc, $"vec_id").limit(1)
      result = result.unionAll(next)
    }
    result.orderBy($"sel_rank")
  }

  val mmrRerankSql: String = {
    val relExpr = sqlCosQ(sqlDotQ("embedding", "qe"),
      sqlDotQ("embedding", "embedding"), sqlDotQ("qe", "qe"))
    val simExpr = sqlCosQ(sqlDotQ("a.embedding", "b.embedding"),
      sqlDotQ("a.embedding", "a.embedding"),
      sqlDotQ("b.embedding", "b.embedding"))
    def round(r: Int): String = {
      val selected = (1 until r).map(i => s"SELECT vec_id FROM s$i")
        .mkString(" UNION ALL ")
      s"""s$r AS (
         |  SELECT CAST($r AS BIGINT) AS sel_rank, c.vec_id, c.rel,
         |         0.5 * c.rel - 0.5 * max(p.sim) AS mmr
         |  FROM cand c
         |  JOIN p ON p.ca = c.vec_id
         |  JOIN ($selected) sel ON p.cb = sel.vec_id
         |  WHERE c.vec_id NOT IN ($selected)
         |  GROUP BY c.vec_id, c.rel
         |  ORDER BY mmr DESC, c.vec_id LIMIT 1)""".stripMargin
    }
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |cand AS (
       |  SELECT vec_id, embedding, $relExpr AS rel
       |  FROM embeddings, q WHERE vec_id <> 0
       |  ORDER BY rel DESC, vec_id LIMIT $C),
       |p AS (
       |  SELECT a.vec_id AS ca, b.vec_id AS cb, $simExpr AS sim
       |  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
       |s1 AS (
       |  SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, rel, rel AS mmr
       |  FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
       |${(2 to R).map(round).mkString(",\n")}
       |SELECT sel_rank, vec_id, rel, mmr
       |FROM (${(1 to R).map(i => s"SELECT * FROM s$i")
            .mkString(" UNION ALL ")})
       |ORDER BY sel_rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x122_mmr_rerank" -> mmrRerank _)

  val oracles: Map[String, String] = Map(
    "x122_mmr_rerank" -> mmrRerankSql)
}
