package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X82 — per-document shingle novelty: the fraction of a document's
  * distinct word 3-gram shingles that occur in NO other document
  * (corpus document-frequency exactly 1). The inverse lens on the
  * dedup family: where X2/X17 hunt shared content, novelty measures
  * what a document contributes that nothing else in the corpus has —
  * the curation signal for "keep despite low quality" (unique content)
  * vs "safe to drop" (everything here exists elsewhere), and the
  * numerator of contamination-style uniqueness audits.
  *
  * Exactness: `n_sh` and `n_unique` are exact i64 counts; `novelty_q`
  * is ONE IEEE division of those identical i64 operands in both
  * engines — bit-equal with no rounding step (the b50/x60 idiom).
  * A shingle with df == 1 names its owner for free (min(doc_id) over
  * a single row), so the unique-count aggregation needs NO join of
  * the df table back onto the shingle stream.
  *
  * Scale shape: rides the shared [[CorpusIndex]] shingle frame (zero
  * extra tokenization in a suite run). Two hash aggregations move
  * data: (sh → df, min_doc) with map-side partials over the shingle
  * stream, then the df==1 survivors — a frame that SHRINKS to at most
  * one row per unique shingle — re-keyed by owner doc. The per-doc
  * n_sh count reuses the doc_id partitioning the index established.
  * No self-join of the shingle frame anywhere; the join that remains
  * is doc-keyed on two already-doc-sized aggregates.
  */
object Novelty {

  def shingleNovelty(spark: SparkSession, dir: String): DataFrame =
    noveltyOf(CorpusIndex.shingles(spark, dir))

  /** Core of X82 over any (doc_id, sh) distinct-shingle frame; test
    * seam. Documents with no shingles (< 3 words) have no rows here,
    * matching the oracle's shingle CTE.
    */
  private[graft] def noveltyOf(shingles: DataFrame): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    val perDoc = shingles.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_sh"))
    // df == 1 shingles carry their single owner as min(doc_id); the
    // aggregate output is vocabulary-bounded, then shrinks to the
    // unique subset before the doc-keyed re-aggregation
    val uniqueOwned = shingles.groupBy($"sh")
      .agg(count(lit(1)).as("df"), min($"doc_id").as("owner"))
      .filter($"df" === 1)
      .groupBy($"owner".as("doc_id"))
      .agg(count(lit(1)).as("n_unique"))
    perDoc.join(uniqueOwned, Seq("doc_id"), "left")
      .select($"doc_id", $"n_sh",
        coalesce($"n_unique", lit(0L)).as("n_unique"))
      .withColumn("novelty_q",
        $"n_unique".cast("double") / $"n_sh".cast("double"))
      .orderBy($"doc_id")
  }

  val shingleNoveltySql: String =
    s"""WITH ${Dedup.shinglesSqlFrom("documents")},
       |per_doc AS (
       |  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
       |uniq AS (
       |  SELECT min(doc_id) AS doc_id, count(*) AS df
       |  FROM sh GROUP BY sh HAVING count(*) = 1),
       |owned AS (
       |  SELECT doc_id, count(*) AS n_unique FROM uniq GROUP BY 1)
       |SELECT p.doc_id, p.n_sh,
       |       COALESCE(o.n_unique, 0) AS n_unique,
       |       CAST(COALESCE(o.n_unique, 0) AS DOUBLE)
       |         / CAST(p.n_sh AS DOUBLE) AS novelty_q
       |FROM per_doc p LEFT JOIN owned o ON p.doc_id = o.doc_id
       |ORDER BY p.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x82_shingle_novelty" -> shingleNovelty _)

  val oracles: Map[String, String] = Map(
    "x82_shingle_novelty" -> shingleNoveltySql)
}
