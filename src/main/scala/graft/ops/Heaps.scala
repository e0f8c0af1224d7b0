package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X158 — per-source Heaps-law fit: the growth exponent β of vocabulary
  * size against tokens ingested (V(n) ≈ K·n^β, Heaps 1978; natural
  * language sits at β ≈ 0.4–0.6) — the capacity-planning statistic for
  * everything vocabulary-bounded in this engine (the `vocab`-class
  * broadcasts, BPE merges, inverted indexes): a feed whose β drifts
  * toward 1 is minting tokens (ids, hashes, boilerplate-noise) and
  * will not saturate; one near 0 is a template loop. X154 reads the
  * STATIC shape of the frequency law; X158 reads its GROWTH curve.
  *
  * Construction — one pass, no per-checkpoint rescans: each word's
  * first-occurrence document (min doc_id per (source, word)) turns the
  * vocabulary curve into a running sum — vocab after doc d = Σ
  * new_words(d' ≤ d) — and tokens after doc d is the running sum of
  * per-doc token counts, both over the same per-source doc_id window;
  * every document then yields one exact (tokens_so_far, vocab_so_far)
  * checkpoint, and the fit is X154's decimal OLS verbatim
  * ([[Zipf.olsFit]]) on (ln n, ln V).
  *
  * Exactness: checkpoints are exact i64 window sums with the total
  * (doc_id) order; ln absorbed by i64 quantization at 1e6; the OLS
  * closed forms run in exact decimal-integer arithmetic (the Spearman
  * mechanism — no float sum, no cross-engine a·b − c·d double).
  * Single-doc sources fit on one point ⇒ NULL by the shared
  * zero-variance guard.
  *
  * Scale shape: tokenize/explode row-local; first-occurrence and
  * per-doc counts are map-side-combined aggregates; the running sums
  * window moves 3 longs per DOCUMENT (not per token) partitioned by
  * source; the OLS is one |sources|-group aggregate over doc-count
  * rows. Output is |sources| rows.
  *
  * Reference scope: no text analytics in the reference; engine
  * extension (SURVEY §2.5, the X154/X107 vocabulary-statistics family).
  */
object Heaps {

  def heapsFit(spark: SparkSession, dir: String): DataFrame =
    heapsFitOf(Tables.documents(spark, dir))

  /** Core of X158 over any (source, doc_id, text) frame. */
  private[graft] def heapsFitOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select($"source", $"doc_id",
        explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
    // per-doc token counts and per-doc NEW-word counts (a word is new
    // in the doc where it first appears — min doc_id per word)
    val perDoc = tok.groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_tok"))
    val firstDoc = tok.groupBy($"source", $"word")
      .agg(min($"doc_id").as("doc_id"))
      .groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_new"))
    val byDoc = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = perDoc
      .join(firstDoc, Seq("source", "doc_id"), "left")
      .select($"source", $"doc_id", $"n_tok",
        coalesce($"n_new", lit(0L)).as("n_new"))
      .withColumn("cum_tok", sum($"n_tok").over(byDoc))
      .withColumn("cum_vocab", sum($"n_new").over(byDoc))
      .select($"source",
        round(log($"cum_tok".cast("double")) * 1e6).cast("long")
          .as("x"),
        round(log($"cum_vocab".cast("double")) * 1e6).cast("long")
          .as("y"))
    Zipf.olsFit(pts, "n_points").orderBy($"source")
  }

  val heapsFitSql: String =
    s"""WITH tok AS (
       |  SELECT source, doc_id, word
       |  FROM (SELECT source, doc_id,
       |               unnest(string_split_regex(lower(text), '\\s+'))
       |                 AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |pd AS (
       |  SELECT source, doc_id, count(*) AS n_tok
       |  FROM tok GROUP BY 1, 2),
       |fd AS (
       |  SELECT source, doc_id, count(*) AS n_new
       |  FROM (SELECT source, word, min(doc_id) AS doc_id
       |        FROM tok GROUP BY 1, 2)
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT pd.source,
       |         sum(pd.n_tok) OVER (PARTITION BY pd.source
       |           ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING)
       |           AS cum_tok,
       |         sum(coalesce(fd.n_new, 0)) OVER (PARTITION BY pd.source
       |           ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING)
       |           AS cum_vocab
       |  FROM pd LEFT JOIN fd
       |    ON pd.source = fd.source AND pd.doc_id = fd.doc_id),
       |pts AS (
       |  SELECT source,
       |         CAST(round(ln(cum_tok) * 1000000) AS BIGINT) AS x,
       |         CAST(round(ln(cum_vocab) * 1000000) AS BIGINT) AS y
       |  FROM cum),
       |${Zipf.olsSqlTail("pts", "n_points")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x158_heaps_fit" -> heapsFit _)

  val oracles: Map[String, String] = Map(
    "x158_heaps_fit" -> heapsFitSql)
}
