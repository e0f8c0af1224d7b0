package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X43 — inverted index build: term → document frequency, total term
  * frequency, and a capped posting list of the top-[[PostK]] documents
  * by per-doc tf (doc_id tiebreak), for terms with df ≥ [[MinDf]].
  * The retrieval-side layout every search / RAG corpus build needs.
  *
  * Scale shape, in shuffle order:
  *   1. tokenize + explode is map-only; the FIRST exchange aggregates
  *      (term, doc_id) → tf with map-side partial combine, so the wire
  *      carries one row per distinct (term, doc) — the compressed
  *      postings stream, not one row per token occurrence;
  *   2. everything after lives on ONE term-hash exchange: the df/tf
  *      rollup, the top-K window, and their join all cluster by term,
  *      so Catalyst reuses a single partitioning (pinned: exactly 3
  *      hash exchanges total incl. the final sort's range input);
  *   3. the top-K window is `row_number ≤ K`, which Spark's
  *      InferWindowGroupLimit turns into a map-side partial
  *      WindowGroupLimit: a stopword's millions of postings are capped
  *      to K per map partition BEFORE the term shuffle — the hot-term
  *      skew guard (plan pinned in InvertedIndexSpec).
  *
  * Postings serialize via to_json(array<long>) — both engines print
  * bigint lists identically, keeping the driver's pandas compare happy
  * (array columns are unhashable there).
  */
object InvertedIndex {

  val MinDf = 5
  val PostK = 8

  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    indexOf(Tables.documents(spark, dir), MinDf, PostK)

  /** Core of X43 over any (doc_id, text) frame; test seam. */
  def indexOf(docs: DataFrame, minDf: Int, postK: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // tf feeds both the df rollup and the top-K window — cache so the
    // tokenize+combine subtree (the expensive exchange) runs once, not
    // once per branch (the x18 edge-list lesson)
    val tf = docs
      .select($"doc_id",
        explode(split(trim(lower($"text")), "\\s+")).as("term"))
      .groupBy($"term", $"doc_id")
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val agg = tf.groupBy($"term")
      .agg(count(lit(1)).as("df"), sum($"tf").as("total_tf"))
      .filter($"df" >= minDf)
    val top = tf
      .withColumn("rk", row_number().over(
        Window.partitionBy($"term").orderBy($"tf".desc, $"doc_id".asc)))
      .filter($"rk" <= postK)
    val postings = top.groupBy($"term")
      .agg(to_json(transform(
        array_sort(collect_list(struct($"rk", $"doc_id"))),
        s => s.getField("doc_id"))).as("postings"))
    agg.join(postings, "term")
      .select($"term", $"df", $"total_tf", $"postings")
      .orderBy($"term")
  }

  val invertedIndexSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
       |  FROM documents),
       |tf AS (
       |  SELECT term, doc_id, count(*) AS tf FROM t GROUP BY 1, 2),
       |agg AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df,
       |         CAST(sum(tf) AS BIGINT) AS total_tf
       |  FROM tf GROUP BY 1 HAVING count(*) >= $MinDf),
       |top AS (
       |  SELECT term, doc_id,
       |         row_number() OVER (PARTITION BY term
       |           ORDER BY tf DESC, doc_id ASC) AS rk
       |  FROM tf),
       |p AS (
       |  SELECT term, to_json(list(doc_id ORDER BY rk)) AS postings
       |  FROM top WHERE rk <= $PostK GROUP BY term)
       |SELECT a.term, a.df, a.total_tf, p.postings
       |FROM agg a JOIN p ON a.term = p.term
       |ORDER BY a.term""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x43_inverted_index" -> invertedIndex _)

  val oracles: Map[String, String] = Map(
    "x43_inverted_index" -> invertedIndexSql)
}
