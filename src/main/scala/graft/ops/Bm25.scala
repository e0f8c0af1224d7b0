package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X68 — BM25 ranked retrieval: top-10 documents per query term under
  * the Okapi BM25 score (k1 = 1.2, b = 0.75) — the ranking function
  * behind every lexical retrieval stage (and the sparse half of hybrid
  * retrieval next to x03/x14's dense ANN). Queries here are the 5
  * rarest corpus terms with df ≥ 3 (a deterministic pseudo-query set;
  * a real workload joins an external query table into the identical
  * plan).
  *
  * Shape: the score needs exactly the inverted-index probe topology —
  * the 5-row query set BROADCASTS into the (doc, term, tf) postings,
  * so only matching postings move (rare terms ⇒ short posting lists:
  * the probe cost is output-bound, not corpus-bound); doc length joins
  * doc-keyed; corpus totals (n_docs, total_tokens) ride a one-row
  * broadcast; the per-term top-10 is a row_number window over the
  * matched postings only (≤ Σ df_q rows — never the corpus). At
  * 100 TB: x43's capped inverted index IS this plan's left side.
  *
  * Parity: every score input is an exact integer (tf, df, dl, n_docs,
  * total_tokens), the arithmetic is written in the identical IEEE
  * order in both engines, and the one `ln` rounds to 6 decimals (the
  * x44 rule: round() absorbs last-ULP libm drift, and ONLY
  * transcendentals get rounded). Ranking happens on the ROUNDED score
  * with doc_id ties, so the cut is identical cross-engine.
  */
object Bm25 {

  private val topK = 10

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopKOf(Tables.documents(spark, dir))

  /** Core of X68 over any (doc_id, text, …) frame; test/scale seam. */
  def bm25TopKOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"doc_id", $"word")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()

    val docLen = tf.groupBy($"doc_id").agg(sum($"tf").as("dl"))
    val dfT = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    val totals = docLen.agg(count(lit(1)).as("n_docs"),
      sum($"dl").as("total_tokens"))
    val qterms = dfT.where($"df" >= 3)
      .orderBy($"df".asc, $"word".asc).limit(5)

    val lenr = ($"dl" * $"n_docs").cast("double") /
      $"total_tokens".cast("double")
    val idf = log(($"n_docs".cast("double") - $"df".cast("double") + 0.5) /
      ($"df".cast("double") + 0.5) + 1.0)
    val score = round(idf * ($"tf".cast("double") * 2.2) /
      ($"tf".cast("double") + lit(1.2) * (lit(0.25) + lit(0.75) * lenr)), 6)

    val scored = tf
      .join(broadcast(qterms.select($"word", $"df")), Seq("word"))
      .join(docLen, Seq("doc_id"))
      .crossJoin(broadcast(totals))
      .select($"word".as("query_term"), $"doc_id", $"tf", $"dl",
        score.as("score"))
    scored
      .withColumn("rank", row_number().over(Window
        .partitionBy($"query_term")
        .orderBy($"score".desc, $"doc_id".asc)))
      .where($"rank" <= topK)
      .select($"query_term", $"rank", $"doc_id", $"tf", $"dl", $"score")
      .orderBy($"query_term", $"rank")
  }

  val bm25TopKSql: String =
    s"""WITH tf AS (
       |  SELECT doc_id, word, count(*) AS tf
       |  FROM (SELECT doc_id,
       |               unnest(string_split_regex(lower(text), '\\s+')) AS word
       |        FROM documents)
       |  WHERE word <> ''
       |  GROUP BY doc_id, word),
       |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl
       |       FROM tf GROUP BY 1),
       |dfx AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |totals AS (SELECT count(*) AS n_docs,
       |                  CAST(sum(dl) AS BIGINT) AS total_tokens FROM dl),
       |q AS (SELECT word, df FROM dfx WHERE df >= 3
       |      ORDER BY df ASC, word ASC LIMIT 5),
       |scored AS (
       |  SELECT q.word AS query_term, tf.doc_id, tf.tf, dl.dl,
       |         round(ln((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
       |                  / (CAST(df AS DOUBLE) + 0.5) + 1.0)
       |               * (CAST(tf.tf AS DOUBLE) * 2.2)
       |               / (CAST(tf.tf AS DOUBLE)
       |                  + 1.2 * (0.25 + 0.75
       |                    * (CAST(dl.dl * n_docs AS DOUBLE)
       |                       / CAST(total_tokens AS DOUBLE)))), 6)
       |           AS score
       |  FROM tf
       |  JOIN q ON tf.word = q.word
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN totals),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY query_term
       |            ORDER BY score DESC, doc_id ASC) AS rank
       |  FROM scored)
       |SELECT query_term, rank, doc_id, tf, dl, score
       |FROM ranked WHERE rank <= $topK
       |ORDER BY query_term, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x68_bm25_topk" -> bm25TopK _)

  val oracles: Map[String, String] = Map(
    "x68_bm25_topk" -> bm25TopKSql)
}
