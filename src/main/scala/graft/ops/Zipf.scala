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
  * Exactness (the Spearman integer mechanism, [[olsFit]]): term
  * frequencies and ranks are exact i64 (rank total-ordered by freq
  * DESC, word ASC); ln() is the one libm call, absorbed by quantizing
  * each VALUE to i64 at 1e6 (round(ln·10⁶) — both engines then hold
  * bit-identical integers); every OLS sum runs in exact decimal, and
  * the closed forms n·Σxy − ΣxΣy / n·Σx² − (Σx)² are exact
  * decimal-integer arithmetic — no float sum and no a·b − c·d double
  * expression anywhere (the pattern FMA-capable evaluators round
  * differently across engines), with one final round6'd division.
  * Degenerate sources (zero x-variance) report NULL slope via
  * explicit guard in both engines.
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
        round(log($"rank".cast("double")) * 1e6).cast("long").as("x"),
        round(log($"freq".cast("double")) * 1e6).cast("long").as("y"))
    olsFit(head, "n_terms").orderBy($"source")
  }

  /** The integer-exact OLS core, shared with X158 (Heaps fit): from
    * (source, x, y) points — x/y already ln-values quantized to i64 at
    * 1e6 (round(ln·1e6), the Spearman mechanism: the closed forms
    * n·Σxy − ΣxΣy and n·Σx² − (Σx)² run in EXACT decimal-integer
    * arithmetic, so no float sum and no a·b − c·d double expression —
    * the pattern FMA-capable evaluators rounded differently across
    * engines at 10× before this rewrite). The 1e-12 quantization
    * factors cancel in the slope ratio; one round6 absorbs the final
    * double ops (division; the intercept's one multiply-subtract).
    * Zero x-variance ⇒ NULL.
    */
  private[graft] def olsFit(pts: DataFrame, nName: String): DataFrame = {
    val spark = pts.sparkSession
    import spark.implicits._
    pts
      .groupBy($"source")
      .agg(count(lit(1)).as(nName),
        // per-row products are i64-safe (|x|,|y| ≤ ~2.2e7 ⇒ ≤ 4.9e14);
        // the sums run in decimal so ANY point count stays exact
        sum($"x".cast("decimal(19,0)")).as("sx_i"),
        sum($"y".cast("decimal(19,0)")).as("sy_i"),
        sum(($"x" * $"y").cast("decimal(28,0)")).as("sxy_i"),
        sum(($"x" * $"x").cast("decimal(28,0)")).as("sxx_i"))
      // (9,0)×(28,0) and (19,0)×(19,0) stay ≤ 38 digits in BOTH
      // engines' decimal rules; the (37,0) casts keep the subtraction
      // inside width 38
      .withColumn("num",
        (col(nName).cast("decimal(9,0)") *
          $"sxy_i".cast("decimal(28,0)")).cast("decimal(37,0)") -
          ($"sx_i".cast("decimal(19,0)") *
            $"sy_i".cast("decimal(19,0)")).cast("decimal(37,0)"))
      .withColumn("den",
        (col(nName).cast("decimal(9,0)") *
          $"sxx_i".cast("decimal(28,0)")).cast("decimal(37,0)") -
          ($"sx_i".cast("decimal(19,0)") *
            $"sx_i".cast("decimal(19,0)")).cast("decimal(37,0)"))
      .withColumn("slope",
        when($"den" === lit(0), lit(null)).otherwise(
          round($"num".cast("double") / $"den".cast("double"), 6)))
      .withColumn("intercept",
        when($"slope".isNull, lit(null)).otherwise(round(
          ($"sy_i".cast("double") / (col(nName).cast("double") * 1e6))
            - $"slope" * ($"sx_i".cast("double") /
              (col(nName).cast("double") * 1e6)), 6)))
      .select($"source", col(nName), $"slope", $"intercept")
  }

  /** The matching oracle tail: OLS CTE + final select over a CTE
    * `<pts>` holding (source, x, y) — integer ln·1e6 points. */
  private[graft] def olsSqlTail(pts: String, nName: String): String =
    s"""s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS $nName,
       |         sum(CAST(x AS DECIMAL(19,0))) AS sx_i,
       |         sum(CAST(y AS DECIMAL(19,0))) AS sy_i,
       |         sum(CAST(x * y AS DECIMAL(28,0))) AS sxy_i,
       |         sum(CAST(x * x AS DECIMAL(28,0))) AS sxx_i
       |  FROM $pts GROUP BY source),
       |nd AS (
       |  SELECT source, $nName, sx_i, sy_i,
       |         CAST(CAST($nName AS DECIMAL(9,0))
       |             * CAST(sxy_i AS DECIMAL(28,0)) AS DECIMAL(37,0))
       |           - CAST(CAST(sx_i AS DECIMAL(19,0))
       |             * CAST(sy_i AS DECIMAL(19,0)) AS DECIMAL(37,0))
       |           AS num,
       |         CAST(CAST($nName AS DECIMAL(9,0))
       |             * CAST(sxx_i AS DECIMAL(28,0)) AS DECIMAL(37,0))
       |           - CAST(CAST(sx_i AS DECIMAL(19,0))
       |             * CAST(sx_i AS DECIMAL(19,0)) AS DECIMAL(37,0))
       |           AS den
       |  FROM s)
       |SELECT source, $nName,
       |       CASE WHEN den = 0 THEN NULL
       |            ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
       |                       6) END AS slope,
       |       CASE WHEN den = 0 THEN NULL
       |            ELSE round((CAST(sy_i AS DOUBLE)
       |                          / (CAST($nName AS DOUBLE) * 1e6))
       |                   - round(CAST(num AS DOUBLE)
       |                             / CAST(den AS DOUBLE), 6)
       |                     * (CAST(sx_i AS DOUBLE)
       |                          / (CAST($nName AS DOUBLE) * 1e6)), 6)
       |            END AS intercept
       |FROM nd
       |ORDER BY source""".stripMargin

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
       |         CAST(round(ln(rank) * 1000000) AS BIGINT) AS x,
       |         CAST(round(ln(freq) * 1000000) AS BIGINT) AS y
       |  FROM (SELECT source, freq,
       |               row_number() OVER (PARTITION BY source
       |                 ORDER BY freq DESC, word ASC) AS rank
       |        FROM tf)
       |  WHERE rank <= $R),
       |${olsSqlTail("hd", "n_terms")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x154_zipf_fit" -> zipfFit _)

  val oracles: Map[String, String] = Map(
    "x154_zipf_fit" -> zipfFitSql)
}
