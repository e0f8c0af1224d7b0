package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X100 — ANN recall audit: measure an approximate index's recall@k
  * against exact ground truth AS A QUERY — the evaluation harness
  * promoted to a first-class, oracle-checked operator. Every ANN
  * deployment needs this loop (build index → sample queries → compare
  * against brute force → decide nprobe/bands); ANN_SWEEP.md runs it as
  * a dev tool, X100 registers it so the measurement itself is under
  * the same correctness gate as the operators it measures. Audited
  * pair here: the X14 LSH top-5 against the exact cosine top-5 for the
  * same fixed query band.
  *
  * Exactness: both lists are deterministic (exact i64-quantized
  * cosines, total (cos DESC, vec_id ASC) order), so the overlap count
  * and recall ratio are exact — the DuckDB oracle re-derives BOTH
  * lists (the full LSH chain and the brute-force rank) and the same
  * join, proving the audit itself is bit-correct. An audit that can
  * silently mis-join its lists reports recall noise as index quality;
  * this one cannot.
  *
  * Scale shape: ground truth is brute-force BY CONSTRUCTION, so the
  * audit runs over a SAMPLED query band (|Q| fixed, here the x14 band)
  * — corpus × |Q| map-only cosine work with a broadcast query side and
  * a per-query top-k window over |Q| partitions; the approximate side
  * reuses the index's own query path unchanged (auditing the plan you
  * ship, not a copy). Cost scales linearly in corpus for fixed |Q| —
  * the standard nightly-recall-canary shape.
  *
  * Reference scope: no vector ops in the reference; engine extension
  * (SURVEY §2.5 similarity-search family).
  */
object RecallAudit {

  def annRecallAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exactCands = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosQ(dotQ($"embedding", $"qe"),
          dotQ($"embedding", $"embedding"),
          dotQ($"qe", $"qe")).as("cos_sim"))
    val exact = Vector.rerankTop5(exactCands).select($"query_id", $"vec_id")
    val approx = Vector.annLshTopK(spark, dir).select($"query_id", $"vec_id")
    recallOf(exact, approx)
  }

  /** The audit join alone over any (query_id, vec_id) ground-truth and
    * candidate lists; fixture seam.
    */
  private[graft] def recallOf(exact: DataFrame, approx: DataFrame): DataFrame = {
    val spark = exact.sparkSession
    import spark.implicits._
    exact.join(approx.withColumn("hit", lit(1L)),
        Seq("query_id", "vec_id"), "left")
      .groupBy($"query_id")
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce($"hit", lit(0L))).as("n_hit"))
      .select($"query_id", $"n_exact", $"n_hit",
        ($"n_hit".cast("double") / $"n_exact".cast("double")).as("recall"))
      .orderBy($"query_id")
  }

  val annRecallAuditSql: String = {
    val cos = sqlCosQ(
      sqlDotQ("c.embedding", "q.embedding"),
      sqlDotQ("c.embedding", "c.embedding"),
      sqlDotQ("q.embedding", "q.embedding"))
    s"""WITH approx AS (
       |  SELECT query_id, vec_id FROM (
       |${Vector.annLshTopKSql.linesIterator.map("    " + _).mkString("\n")}
       |  )),
       |ex AS (
       |  SELECT q.vec_id AS query_id, c.vec_id, $cos AS cos_sim
       |  FROM embeddings c JOIN embeddings q
       |    ON q.vec_id < 3 AND c.vec_id <> q.vec_id),
       |exact AS (
       |  SELECT query_id, vec_id FROM (
       |    SELECT query_id, vec_id, row_number() OVER (
       |      PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |    FROM ex)
       |  WHERE rnk <= 5)
       |SELECT e.query_id,
       |       CAST(count(*) AS BIGINT) AS n_exact,
       |       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_hit,
       |       CAST(sum(CASE WHEN a.vec_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS DOUBLE) / CAST(count(*) AS DOUBLE) AS recall
       |FROM exact e LEFT JOIN approx a
       |  ON e.query_id = a.query_id AND e.vec_id = a.vec_id
       |GROUP BY e.query_id
       |ORDER BY e.query_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x100_ann_recall" -> annRecallAudit _)

  val oracles: Map[String, String] = Map(
    "x100_ann_recall" -> annRecallAuditSql)
}
