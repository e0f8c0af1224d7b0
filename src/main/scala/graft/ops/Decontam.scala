package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X24 — benchmark decontamination: flag training documents that share a
  * long word n-gram with an evaluation set — the standard contamination
  * rule (verbatim-overlap at a length where accidental collision is
  * effectively impossible), run as a corpus-scale join.
  *
  * Shape at 100 TB: the EVAL side is a benchmark suite — small and fixed
  * — so its distinct n-gram set is built once and BROADCAST; the corpus
  * side streams through a row-local n-gram explode and a broadcast hash
  * join, no corpus-wide shuffle at all (the per-doc aggregation shuffles
  * only the matched (doc, ngram) pairs — contamination is rare by
  * construction, so that remainder is tiny).
  *
  * On this testdata there is no separate benchmark table; the eval set
  * is the deterministic `doc_id % 20 == 0` slice (documented stand-in —
  * swap `isEval` for a join against the real suite). n = 6 rather than
  * the customary 13 because the synthetic corpus' 31-word vocabulary
  * makes docs short (10-99 tokens); the flag fires on planted near-dups
  * of eval docs at both shipped SFs (2 docs at sf0.01, 28 at sf0.1),
  * never on unrelated docs.
  */
object Decontam {

  /** Registered-query parameters; the oracle mirrors both. */
  val N = 6
  private def evalSlice = col("doc_id") % 20 === 0

  def decontamination(spark: SparkSession, dir: String): DataFrame =
    decontaminationOf(Tables.documents(spark, dir), evalSlice, N)

  /** Core of X24 over any (doc_id, text) frame: `isEval` marks the
    * benchmark slice (swap for a join against a real suite), `n` the
    * overlap length (13 is customary on natural text).
    */
  def decontaminationOf(
      docs: DataFrame,
      isEval: org.apache.spark.sql.Column,
      n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams = Dedup.ngramsOf(docs, n)
    val evalGrams = grams.filter(isEval).select($"sh").distinct()
    val hits = grams.filter(!isEval)
      .join(broadcast(evalGrams), "sh")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_shared")) // grams are distinct per doc
    docs
      .select($"doc_id", isEval.as("is_eval"))
      .join(hits, Seq("doc_id"), "left")
      .select($"doc_id", $"is_eval",
        coalesce($"n_shared", lit(0L)).as("n_shared"),
        (coalesce($"n_shared", lit(0L)) > 0 && !$"is_eval").as("contaminated"))
      .orderBy($"doc_id")
  }

  val decontaminationSql: String = {
    val parts = (0 until N).map(j => s"words[i+$j]").mkString(" || ' ' || ")
    s"""WITH g AS (
       |  SELECT DISTINCT doc_id, $parts AS sh
       |  FROM (SELECT doc_id,
       |               list_filter(string_split_regex(trim(lower(text)), '\\s+'),
       |                           w -> w <> '') AS words
       |        FROM documents),
       |       LATERAL unnest(generate_series(1, len(words) - ${N - 1})) AS u(i)),
       |ev AS (SELECT DISTINCT sh FROM g WHERE doc_id % 20 = 0),
       |hits AS (
       |  SELECT doc_id, count(*) AS n_shared
       |  FROM g JOIN ev USING (sh)
       |  WHERE doc_id % 20 <> 0
       |  GROUP BY doc_id)
       |SELECT d.doc_id,
       |       d.doc_id % 20 = 0 AS is_eval,
       |       coalesce(h.n_shared, 0) AS n_shared,
       |       (coalesce(h.n_shared, 0) > 0 AND d.doc_id % 20 <> 0) AS contaminated
       |FROM documents d
       |LEFT JOIN hits h ON d.doc_id = h.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x24_decontamination" -> decontamination _)

  val oracles: Map[String, String] = Map(
    "x24_decontamination" -> decontaminationSql)
}
