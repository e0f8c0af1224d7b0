package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** Similarity search over the `embeddings` table (64-dim `array<float>`,
  * SURVEY.md §2.5 X3/X4). The reference has no vector operations; these are
  * the north-star ANN/similarity extensions.
  *
  * All cosine math goes through the fixed-point `dotQ` quantization
  * (graft.functions.Hashing) so Spark and the DuckDB oracle agree
  * bit-for-bit regardless of accumulation order — see Hashing's scaladoc.
  *
  * Scale discipline:
  *  - top-k against a single query vector is a broadcast of the query +
  *    a TakeOrderedAndProject (per-partition heaps, k rows to the driver) —
  *    no shuffle of the embedding corpus;
  *  - the pairwise join is *blocked* on `label` (never an unblocked
  *    cross-join): each block self-joins independently, so work is
  *    Σ|block|², parallel across blocks, and AQE handles skewed blocks.
  *    At 100 TB the same shape holds with any coarse quantizer (IVF cell,
  *    LSH bucket) as the blocking key — see `annLshTopK` for that path.
  */
object Vector {

  /** X3 — brute-force cosine top-k against one query vector (vec_id 0),
    * the exactness baseline for ANN. The query row is broadcast; the scan
    * side computes one fused row-local expression per vector.
    */
  def cosineTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" === 0).select($"embedding".as("qe"))
    e.crossJoin(broadcast(q))
      .select($"vec_id", $"label",
        cosQ(
          dotQ($"embedding", $"qe"),
          dotQ($"embedding", $"embedding"),
          dotQ($"qe", $"qe")).as("cos_sim"))
      .orderBy($"cos_sim".desc, $"vec_id".asc)
      .limit(20)
  }

  val cosineTopKSql: String = {
    val dq = sqlDotQ("embedding", "qe")
    val na = sqlDotQ("embedding", "embedding")
    val nq = sqlDotQ("qe", "qe")
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, label, ${sqlCosQ(dq, na, nq)} AS cos_sim
       |FROM embeddings, q
       |ORDER BY cos_sim DESC, vec_id ASC
       |LIMIT 20""".stripMargin
  }

  /** X4 — pairwise similarity join, blocked by `label`: all pairs within a
    * block with cosine ≥ τ. τ = 0.35 is set for the testdata distribution
    * (max within-block cosine ≈ 0.47); the threshold compares
    * deterministically because both engines compute identical doubles.
    */
  def pairwiseSimilarity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
      .select($"vec_id", $"label", $"embedding",
        dotQ($"embedding", $"embedding").as("nq"))
    val a = e.select($"vec_id".as("vec_a"), $"label",
      $"embedding".as("emb_a"), $"nq".as("nq_a"))
    val b = e.select($"vec_id".as("vec_b"), $"label".as("label_b"),
      $"embedding".as("emb_b"), $"nq".as("nq_b"))
    a.join(b, $"label" === $"label_b" && $"vec_a" < $"vec_b")
      .select($"label", $"vec_a", $"vec_b",
        cosQ(dotQ($"emb_a", $"emb_b"), $"nq_a", $"nq_b").as("cos_sim"))
      .filter($"cos_sim" >= 0.35)
      .orderBy($"label", $"vec_a", $"vec_b")
  }

  val pairwiseSimilaritySql: String = {
    val dq = sqlDotQ("a.embedding", "b.embedding")
    s"""WITH e AS (SELECT vec_id, label, embedding,
       |                  ${sqlDotQ("embedding", "embedding")} AS nq
       |           FROM embeddings)
       |SELECT a.label AS label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ${sqlCosQ(dq, "a.nq", "b.nq")} AS cos_sim
       |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${sqlCosQ(dq, "a.nq", "b.nq")} >= 0.35
       |ORDER BY label, vec_a, vec_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x03_cosine_topk" -> cosineTopK _,
    "x04_pairwise_similarity" -> pairwiseSimilarity _)

  val oracles: Map[String, String] = Map(
    "x03_cosine_topk" -> cosineTopKSql,
    "x04_pairwise_similarity" -> pairwiseSimilaritySql)
}
