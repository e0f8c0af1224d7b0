package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X154 — per-source Zipf fit: the OLS slope of ln(frequency) on
  * ln(rank) over each source's top-[[R]] terms — the one-number
  * naturalness test for a text feed (natural language sits near
  * slope ≈ −1, Zipf 1949; templated/boilerplate feeds flatten toward 0,
  * token-salad steepens), the screening statistic a corpus audit runs
  * per source next to X107's vocabulary richness (type/token mass) and
  * X98's bigram surprisal (sequence plausibility) — X154 reads the
  * SHAPE of the frequency law itself.
  *
  * Exactness (the round6+decimal discipline): term frequencies and
  * ranks are exact i64 (rank total-ordered by freq DESC, word ASC);
  * ln() is the one libm call, absorbed by round(·, 6) on each VALUE
  * (lx = round6(ln rank), ly = round6(ln freq)) — both engines then
  * hold bit-identical DECIMAL(12,6) operands; every OLS sum (Σx, Σy,
  * Σxy, Σx²) runs in decimal (products are exact at 12 dp — no float
  * sum anywhere, so partition order cannot matter), and the closed-form
  * slope/intercept are fixed-order double expressions of those exact
  * sums. Degenerate sources (one distinct term ⇒ zero x-variance)
  * report NULL slope via explicit guard in both engines.
  *
  * Scale shape: tokenize/explode row-local (X6's doc-keyed shape); the
  * (source, word) count is map-side combined and vocab-bounded; the
  * top-R cut is a per-source window over each source's vocab slice
  * (WindowGroupLimit pushes the rank filter); the OLS pass aggregates
  * R rows per source. Output is |sources| rows.
  *
  * Reference scope: no text analytics in the reference; engine
  * extension (SURVEY §2.5, the X98/X107/X130 source-screening family).
  */
object Zipf {

  /** Head size of the rank-frequency curve the line is fit to (the
    * classical Zipf regime; the tail bends away from the power law). */
  val R = 100

  def zipfFit(spark: SparkSession, dir: String): DataFrame =
    zipfFitOf(Tables.documents(spark, dir))

  /** Core of X154 over any (source, text) frame; ScaleBench seam. */
  private[graft] def zipfFitOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val byFreq = Window.partitionBy($"source")
      .orderBy($"freq".desc, $"word".asc)
    val head = docs
      .repartition(spark.sparkContext.defaultParallelism, $"source")
      .select($"source", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"source", $"word").agg(count(lit(1)).as("freq"))
      .withColumn("rank", row_number().over(byFreq).cast("long"))
      .filter($"rank" <= R)
      .select($"source",
        round(log($"rank".cast("double")), 6).cast("decimal(12,6)")
          .as("lx"),
        round(log($"freq".cast("double")), 6).cast("decimal(12,6)")
          .as("ly"))
    head
      .groupBy($"source")
      .agg(count(lit(1)).as("n_terms"),
        sum($"lx").cast("double").as("sx"),
        sum($"ly").cast("double").as("sy"),
        sum($"lx" * $"ly").cast("double").as("sxy"),
        sum($"lx" * $"lx").cast("double").as("sxx"))
      .withColumn("slope",
        when($"n_terms" * $"sxx" - $"sx" * $"sx" === 0.0, lit(null))
          .otherwise(($"n_terms" * $"sxy" - $"sx" * $"sy") /
            ($"n_terms" * $"sxx" - $"sx" * $"sx")))
      .withColumn("intercept",
        when($"slope".isNull, lit(null)).otherwise(
          ($"sy" - $"slope" * $"sx") / $"n_terms".cast("double")))
      .select($"source", $"n_terms", $"slope", $"intercept")
      .orderBy($"source")
  }

  val zipfFitSql: String =
    s"""WITH tf AS (
       |  SELECT source, word, count(*) AS freq
       |  FROM (SELECT source,
       |               unnest(string_split_regex(lower(text), '\\s+'))
       |                 AS word
       |        FROM documents)
       |  WHERE word <> ''
       |  GROUP BY 1, 2),
       |hd AS (
       |  SELECT source,
       |         CAST(round(ln(rank), 6) AS DECIMAL(12,6)) AS lx,
       |         CAST(round(ln(freq), 6) AS DECIMAL(12,6)) AS ly
       |  FROM (SELECT source, freq,
       |               row_number() OVER (PARTITION BY source
       |                 ORDER BY freq DESC, word ASC) AS rank
       |        FROM tf)
       |  WHERE rank <= $R),
       |s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n_terms,
       |         CAST(sum(lx) AS DOUBLE) AS sx,
       |         CAST(sum(ly) AS DOUBLE) AS sy,
       |         CAST(sum(lx * ly) AS DOUBLE) AS sxy,
       |         CAST(sum(lx * lx) AS DOUBLE) AS sxx
       |  FROM hd GROUP BY source)
       |SELECT source, n_terms,
       |       CASE WHEN n_terms * sxx - sx * sx = 0.0 THEN NULL
       |            ELSE (n_terms * sxy - sx * sy)
       |                   / (n_terms * sxx - sx * sx) END AS slope,
       |       CASE WHEN n_terms * sxx - sx * sx = 0.0 THEN NULL
       |            ELSE (sy - (n_terms * sxy - sx * sy)
       |                    / (n_terms * sxx - sx * sx) * sx)
       |                   / CAST(n_terms AS DOUBLE) END AS intercept
       |FROM s
       |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x154_zipf_fit" -> zipfFit _)

  val oracles: Map[String, String] = Map(
    "x154_zipf_fit" -> zipfFitSql)
}
