package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X69 — hybrid retrieval with Reciprocal Rank Fusion: for each query
  * document, fuse a DENSE ranking (x03's exact quantized cosine over
  * the aligned embedding) with a LEXICAL ranking (shingle-overlap
  * count, the x17 signal) via RRF: `score = 1/(60+r_dense) +
  * 1/(60+r_lex)`, missing-list terms contributing 0 — the standard
  * two-retriever fusion (k = 60) every RAG stack runs, exercising the
  * documents↔embeddings id alignment end to end. Queries are doc ids
  * 0..2 (deterministic; an external query table joins into the same
  * plan).
  *
  * Shape: the 3-row query set broadcasts into both retrievers — the
  * dense side is one row-local fused cosine per (query, vector) with
  * a query-partitioned top-20 window (at open scale this side IS
  * x14/x19/x21's ANN probe; the brute-force form is the exactness
  * baseline, x03's role), the lexical side joins the query shingles
  * (broadcast) against the corpus shingle table keyed on the shingle
  * and two-phase-counts overlaps — candidate volume is posting-bound
  * exactly like x68. Fusion is a full outer join of two ≤ 20-row-per-
  * query lists: negligible at any scale.
  *
  * Parity: ranks are exact integers from deterministic (quantized
  * metric, id tie-break) orders; the RRF score is the same two-term
  * IEEE sum of divisions of identical integers in both engines; final
  * order (score DESC, doc ASC) ties deterministically.
  */
object Hybrid {

  private val nQueries = 3
  private val listK = 20
  private val fusedK = 10

  def hybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrfSh(CorpusIndex.shingles(spark, dir),
      Tables.embeddings(spark, dir))

  /** Core of X69 over any (doc_id, text) corpus and aligned embedding
    * table (ScaleBench seam — the lexical retriever scales with the
    * corpus; the dense side is bounded by the embedding table).
    */
  private[graft] def hybridRrfOf(docs: DataFrame, e: DataFrame): DataFrame =
    hybridRrfSh(Dedup.shinglesOf(docs).cache(), e)

  /** X69 over a pre-materialized shingle frame — the registered query
    * reads the shared [[CorpusIndex]] checkpoint (its lexical retriever
    * needs only shingles, never the raw text).
    */
  private[graft] def hybridRrfSh(sh0: DataFrame, e: DataFrame): DataFrame = {
    val spark = sh0.sparkSession
    import spark.implicits._
    val qv = e.where($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))

    val dense = e.crossJoin(broadcast(qv))
      .where($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("doc_id"),
        cosQ(dotQ($"embedding", $"qe"),
          dotQ($"embedding", $"embedding"),
          dotQ($"qe", $"qe")).as("cos_sim"))
      .withColumn("dense_rank", row_number().over(Window
        .partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"doc_id".asc)))
      .where($"dense_rank" <= listK)

    val sh = sh0
    val qsh = sh.where($"doc_id" < nQueries)
      .select($"doc_id".as("query_id"), $"sh")
    val lex = sh.join(broadcast(qsh), Seq("sh"))
      .where($"doc_id" =!= $"query_id")
      .groupBy($"query_id", $"doc_id")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("lex_rank", row_number().over(Window
        .partitionBy($"query_id")
        .orderBy($"n_common".desc, $"doc_id".asc)))
      .where($"lex_rank" <= listK)

    dense.select($"query_id", $"doc_id", $"dense_rank")
      .join(lex.select($"query_id", $"doc_id", $"lex_rank"),
        Seq("query_id", "doc_id"), "full")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(60.0) + $"dense_rank".cast("double")),
          lit(0.0)) +
        coalesce(lit(1.0) / (lit(60.0) + $"lex_rank".cast("double")),
          lit(0.0)))
      .withColumn("rank", row_number().over(Window
        .partitionBy($"query_id")
        .orderBy($"rrf_score".desc, $"doc_id".asc)))
      .where($"rank" <= fusedK)
      .select($"query_id", $"rank", $"doc_id", $"dense_rank", $"lex_rank",
        $"rrf_score")
      .orderBy($"query_id", $"rank")
  }

  val hybridRrfSql: String = {
    val dq = sqlDotQ("e.embedding", "q.qe")
    val na = sqlDotQ("e.embedding", "e.embedding")
    val nq = sqlDotQ("q.qe", "q.qe")
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |           FROM embeddings WHERE vec_id < $nQueries),
       |dense AS (
       |  SELECT query_id, doc_id, dense_rank FROM (
       |    SELECT q.query_id, e.vec_id AS doc_id,
       |           row_number() OVER (PARTITION BY q.query_id
       |             ORDER BY ${sqlCosQ(dq, na, nq)} DESC, e.vec_id ASC)
       |             AS dense_rank
       |    FROM embeddings e CROSS JOIN q
       |    WHERE e.vec_id <> q.query_id)
       |  WHERE dense_rank <= $listK),
       |${Dedup.shinglesSqlFrom("documents")},
       |qsh AS (SELECT doc_id AS query_id, sh FROM sh WHERE doc_id < $nQueries),
       |lex AS (
       |  SELECT query_id, doc_id, lex_rank FROM (
       |    SELECT query_id, doc_id,
       |           row_number() OVER (PARTITION BY query_id
       |             ORDER BY n_common DESC, doc_id ASC) AS lex_rank
       |    FROM (SELECT qsh.query_id, sh.doc_id, count(*) AS n_common
       |          FROM sh JOIN qsh ON sh.sh = qsh.sh
       |          WHERE sh.doc_id <> qsh.query_id
       |          GROUP BY 1, 2))
       |  WHERE lex_rank <= $listK)
       |SELECT query_id, rank, doc_id, dense_rank, lex_rank, rrf_score
       |FROM (
       |  SELECT coalesce(d.query_id, l.query_id) AS query_id,
       |         coalesce(d.doc_id, l.doc_id) AS doc_id,
       |         d.dense_rank, l.lex_rank,
       |         coalesce(1.0 / (60.0 + CAST(d.dense_rank AS DOUBLE)), 0.0)
       |           + coalesce(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0)
       |           AS rrf_score,
       |         row_number() OVER (
       |           PARTITION BY coalesce(d.query_id, l.query_id)
       |           ORDER BY coalesce(1.0 / (60.0 + CAST(d.dense_rank AS DOUBLE)), 0.0)
       |             + coalesce(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0) DESC,
       |             coalesce(d.doc_id, l.doc_id) ASC) AS rank
       |  FROM dense d
       |  FULL JOIN lex l ON d.query_id = l.query_id AND d.doc_id = l.doc_id)
       |WHERE rank <= $fusedK
       |ORDER BY query_id, rank""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x69_hybrid_rrf" -> hybridRrf _)

  val oracles: Map[String, String] = Map(
    "x69_hybrid_rrf" -> hybridRrfSql)
}
