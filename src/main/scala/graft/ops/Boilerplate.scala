package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X157 — boilerplate phrase audit: per source, the top-[[K]] word
  * [[N]]-gram phrases by cross-document frequency (df ≥ [[MinDf]]),
  * with the fraction of the source's documents carrying each — the
  * REPORT a curation team reads before writing boilerplate-strip rules
  * (headers, footers, navigation chrome, license blurbs — the C4/CCNet
  * prep step). The dedup family DECIDES with this signal (X17/X82/X125
  * consume shingles as machinery); X157 SURFACES it: which literal
  * phrases repeat, where, and how much of the feed they cover.
  *
  * Exactness: phrases are positional word n-grams of the x05 token
  * convention (lower + whitespace split), deduplicated per document
  * (document frequency, not occurrence count); df and n_docs are exact
  * i64; coverage is one double division; the per-source top-K rank
  * carries the (df DESC, phrase ASC) total tie-break.
  *
  * Scale shape: n-gram generation is row-local (an in-document
  * transform over the token array — no join, no explode-then-window);
  * the (source, phrase) df aggregate is map-side combined and
  * phrase-vocabulary-bounded; the MinDf filter drops the singleton
  * long tail BEFORE the rank; the top-K is a per-source window over
  * each source's surviving phrases (WindowGroupLimit). Output is
  * ≤ |sources|·K rows.
  *
  * Reference scope: no text analytics in the reference; engine
  * extension (SURVEY §2.5, the X104/X130 per-source report family).
  */
object Boilerplate {

  val N = 3
  val K = 5
  val MinDf = 2L

  def boilerplatePhrases(spark: SparkSession, dir: String): DataFrame =
    phrasesOf(Tables.documents(spark, dir))

  /** Core of X157 over any (source, doc_id, text) frame. */
  private[graft] def phrasesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nDocs = docs.groupBy($"source").agg(count(lit(1)).as("n_docs"))
    val bySource = Window.partitionBy($"source")
      .orderBy($"df".desc, $"phrase".asc)
    // lambda-free n-gram build (round-18 optimization): zip N shifted
    // slices and explode — the transform(sequence(…)) form evaluates
    // its lambda interpreted, one boxed call per position, outside
    // whole-stage codegen (the Dedup.shinglesOf lesson, ~7× slower)
    val len = size($"ws") - (N - 1)
    docs
      .select($"source", $"doc_id",
        split(trim(lower($"text")), "\\s+").as("ws"))
      .filter(size($"ws") >= N) // also keeps the slice length positive
      .select($"source", $"doc_id", explode(arrays_zip(
        (0 until N).map(j => slice($"ws", lit(j + 1), len)): _*)).as("z"))
      .select($"source", $"doc_id",
        concat_ws(" ", (0 until N).map(j => col(s"z.$j")): _*).as("phrase"))
      .distinct() // document frequency, not occurrence count
      .groupBy($"source", $"phrase").agg(count(lit(1)).as("df"))
      .filter($"df" >= MinDf)
      .withColumn("rank", row_number().over(bySource).cast("long"))
      .filter($"rank" <= K)
      .join(broadcast(nDocs), Seq("source"))
      .select($"source", $"rank", $"phrase", $"df", $"n_docs",
        ($"df".cast("double") / $"n_docs".cast("double")).as("coverage"))
      .orderBy($"source", $"rank")
  }

  val boilerplatePhrasesSql: String =
    s"""WITH w AS (
       |  SELECT source, doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT source, doc_id,
       |         array_to_string(ws[i:i+${N - 1}], ' ') AS phrase
       |  FROM w, LATERAL unnest(generate_series(1, len(ws) - ${N - 1}))
       |       AS u(i)
       |  WHERE len(ws) >= $N),
       |d AS (
       |  SELECT source, phrase, CAST(count(*) AS BIGINT) AS df
       |  FROM g GROUP BY 1, 2 HAVING count(*) >= $MinDf),
       |nd AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
       |  FROM documents GROUP BY 1),
       |r AS (
       |  SELECT source, phrase, df,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY df DESC, phrase ASC) AS rank
       |  FROM d)
       |SELECT r.source, CAST(r.rank AS BIGINT) AS rank, r.phrase, r.df,
       |       nd.n_docs,
       |       CAST(r.df AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)
       |         AS coverage
       |FROM r JOIN nd ON r.source = nd.source
       |WHERE r.rank <= $K
       |ORDER BY r.source, r.rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x157_boilerplate_phrases" -> boilerplatePhrases _)

  val oracles: Map[String, String] = Map(
    "x157_boilerplate_phrases" -> boilerplatePhrasesSql)
}
