package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X130 — distinctive-term audit: the top-K terms most ASSOCIATED with
  * each source by smoothed document-frequency odds ratio — the
  * "what is this source actually about" fingerprint behind mixture
  * debugging and contamination triage (X6's tf-idf scores terms within
  * one doc against the corpus; X44's PMI scores term-term collocation;
  * X130 scores term-SOURCE association, the axis a curation pass
  * argues about). A term's 2×2 table per source is
  * (a = source docs with it, b = source docs without, c = other docs
  * with, d = other docs without) and the +1-smoothed odds ratio is
  * (a+1)(d+1)/((b+1)(c+1)) — smoothing keeps zero cells finite and
  * biases nothing at corpus counts.
  *
  * Exactness: all four cells are i64 document counts derived from ONE
  * (source, word) distinct-doc aggregate plus its word and source
  * marginals (cells re-aggregate the CELLS — the X115 discipline,
  * never the corpus twice); the ratio is one double division of two
  * exact i64 products (each ≤ (N+1)² < 2⁵³ — both casts exact, both
  * engines identical), and the per-source top-K rank carries the
  * (odds DESC, word ASC) total tie-break. Noise terms are screened by
  * a corpus df ≥ 5 floor.
  *
  * Scale shape: tokenize/explode is row-local (doc-keyed repartition,
  * the X6 shape); the cell aggregate is map-side-combined and
  * vocab×sources-bounded; marginals join the cells by broadcast; the
  * top-K is a per-SOURCE window over each source's vocab slice —
  * partitioned, never global. Output is #sources × K rows.
  *
  * Reference scope: no text analytics in the reference; engine
  * extension (SURVEY §2.5, the X6/X7/X44/X115 text-composition family).
  */
object Distinctive {

  val K = 10
  val MinDf = 5L

  def distinctiveTerms(spark: SparkSession, dir: String): DataFrame =
    distinctiveTermsOf(Tables.documents(spark, dir))

  /** Core of X130 over any (source, doc_id, text) frame; ScaleBench
    * seam. */
  private[graft] def distinctiveTermsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab×sources rows; feeds BOTH the word marginal and the scored
    // join — materialized so the tokenize+distinct corpus pass runs
    // once, not per reference (round-18 optimization; the AQE-final
    // plan held the whole Generate+aggregate chain twice)
    val cells = docs
      .repartition(spark.sparkContext.defaultParallelism, $"doc_id")
      .select($"source", $"doc_id",
        explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .distinct() // document frequency, not term frequency
      .groupBy($"source", $"word").agg(count(lit(1)).as("a"))
      .localCheckpoint()
    val nDocs = docs.groupBy($"source").agg(count(lit(1)).as("n_src"))
    val wordTot = cells.groupBy($"word").agg(sum($"a").as("df_all"))
      .filter($"df_all" >= MinDf)
    val total = docs.agg(count(lit(1)).as("n_all"))
    val scored = cells
      .join(broadcast(nDocs), "source")
      .join(wordTot, "word")
      .crossJoin(broadcast(total))
      .select($"source", $"word", $"a", $"n_src", $"df_all", $"n_all",
        ($"n_src" - $"a").as("b"), ($"df_all" - $"a").as("c"),
        ($"n_all" - $"n_src" - ($"df_all" - $"a")).as("d"))
      .withColumn("or_q",
        (($"a" + lit(1L)) * ($"d" + lit(1L))).cast("double") /
          (($"b" + lit(1L)) * ($"c" + lit(1L))).cast("double"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy($"source").orderBy($"or_q".desc, $"word"))
        .cast("long"))
      .filter($"rank" <= K)
      .select($"source", $"rank", $"word", $"a".as("df_in"), $"n_src",
        $"df_all", $"or_q")
      .orderBy($"source", $"rank")
  }

  val distinctiveTermsSql: String =
    s"""WITH tok AS (
       |  SELECT DISTINCT source, doc_id, word
       |  FROM (SELECT source, doc_id,
       |               unnest(string_split_regex(lower(text), '\\s+'))
       |                 AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |cells AS (
       |  SELECT source, word, count(*) AS a FROM tok GROUP BY 1, 2),
       |nd AS (SELECT source, count(*) AS n_src FROM documents GROUP BY 1),
       |wt AS (SELECT word, sum(a) AS df_all FROM cells GROUP BY word
       |       HAVING sum(a) >= $MinDf),
       |tot AS (SELECT count(*) AS n_all FROM documents),
       |scored AS (
       |  SELECT c.source, c.word, c.a, nd.n_src, wt.df_all, tot.n_all,
       |         nd.n_src - c.a AS b, wt.df_all - c.a AS c_cell,
       |         tot.n_all - nd.n_src - (wt.df_all - c.a) AS d,
       |         CAST((c.a + 1) * (tot.n_all - nd.n_src
       |                 - (wt.df_all - c.a) + 1) AS DOUBLE)
       |           / CAST((nd.n_src - c.a + 1) * (wt.df_all - c.a + 1)
       |               AS DOUBLE) AS or_q
       |  FROM cells c
       |  JOIN nd ON c.source = nd.source
       |  JOIN wt ON c.word = wt.word
       |  CROSS JOIN tot),
       |r AS (
       |  SELECT source, word, a, n_src, df_all, or_q,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY or_q DESC, word) AS rank
       |  FROM scored)
       |SELECT source, CAST(rank AS BIGINT) AS rank, word,
       |       CAST(a AS BIGINT) AS df_in, CAST(n_src AS BIGINT) AS n_src,
       |       CAST(df_all AS BIGINT) AS df_all, or_q
       |FROM r WHERE rank <= $K
       |ORDER BY source, rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x130_distinctive_terms" -> distinctiveTerms _)

  val oracles: Map[String, String] = Map(
    "x130_distinctive_terms" -> distinctiveTermsSql)
}
