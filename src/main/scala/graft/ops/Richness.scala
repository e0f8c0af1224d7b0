package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X107 — vocabulary richness estimation per language: observed
  * vocabulary, singleton/doubleton counts, the bias-corrected Chao1
  * estimate of the TRUE (seen + unseen) vocabulary size, and the
  * Good–Turing estimate of unseen-word probability mass — the
  * "how much more is out there" question a corpus-collection effort
  * asks before deciding whether another crawl of a language is worth
  * it (X50 says what the words you HAVE cover; X107 estimates what you
  * DON'T have: frequency-of-frequencies is the sufficient statistic
  * for both estimators).
  *
  * Exactness: the bias-corrected Chao1, `V + f1·(f1−1) / (2·(f2+1))`,
  * is always defined (no f2=0 blow-up) and emits as the single exact
  * fraction `(V·2·(f2+1) + f1·(f1−1)) / (2·(f2+1))` — i64 numerator
  * and denominator plus ONE IEEE division (`chao1_q`, the b50/X99
  * discipline). Good–Turing unseen mass is the exact fraction
  * `f1 / n_tokens` (`gt_q` likewise).
  *
  * Scale shape: two stacked hash-aggregations, both map-side combined —
  * (lang, word) term counts (vocabulary-bounded output), then the
  * per-lang frequency-of-frequencies rollup (language-bounded). No
  * window, no join, nothing global but the final ORDER BY. This is the
  * cheapest query in the profile family and the shape survives any
  * corpus size: the only data-sized pass is the token explode.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X7/X25/X50 corpus-profile family).
  */
object Richness {

  def vocabRichness(spark: SparkSession, dir: String): DataFrame =
    richnessOf(Tables.documents(spark, dir))

  /** Core of X107 over any (text, lang) frame; test seam. */
  private[graft] def richnessOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val freq = docs
      .select($"lang", explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"lang", $"word").agg(count(lit(1)).as("f"))
    freq.groupBy($"lang")
      .agg(
        sum($"f").as("n_tokens"),
        count(lit(1)).as("v_obs"),
        sum(when($"f" === 1, 1L).otherwise(0L)).as("f1"),
        sum(when($"f" === 2, 1L).otherwise(0L)).as("f2"))
      .select($"lang", $"n_tokens", $"v_obs", $"f1", $"f2",
        ($"v_obs" * lit(2L) * ($"f2" + 1L) + $"f1" * ($"f1" - 1L))
          .as("chao1_num"),
        (lit(2L) * ($"f2" + 1L)).as("chao1_den"),
        (($"v_obs" * lit(2L) * ($"f2" + 1L) + $"f1" * ($"f1" - 1L))
          .cast("double") / (lit(2L) * ($"f2" + 1L)).cast("double"))
          .as("chao1_q"),
        ($"f1".cast("double") / $"n_tokens".cast("double")).as("gt_q"))
      .orderBy($"lang")
  }

  val vocabRichnessSql: String =
    """WITH tok AS (
      |  SELECT lang,
      |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      |  FROM documents),
      |freq AS (SELECT lang, word, count(*) AS f FROM tok GROUP BY 1, 2),
      |agg AS (
      |  SELECT lang,
      |         sum(f) AS n_tokens,
      |         count(*) AS v_obs,
      |         sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS f1,
      |         sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS f2
      |  FROM freq GROUP BY lang)
      |SELECT lang,
      |       CAST(n_tokens AS BIGINT) AS n_tokens,
      |       CAST(v_obs AS BIGINT) AS v_obs,
      |       CAST(f1 AS BIGINT) AS f1,
      |       CAST(f2 AS BIGINT) AS f2,
      |       CAST(v_obs * 2 * (f2 + 1) + f1 * (f1 - 1) AS BIGINT) AS chao1_num,
      |       CAST(2 * (f2 + 1) AS BIGINT) AS chao1_den,
      |       CAST(v_obs * 2 * (f2 + 1) + f1 * (f1 - 1) AS DOUBLE)
      |         / CAST(2 * (f2 + 1) AS DOUBLE) AS chao1_q,
      |       CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS gt_q
      |FROM agg
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x107_vocab_richness" -> vocabRichness _)

  val oracles: Map[String, String] = Map(
    "x107_vocab_richness" -> vocabRichnessSql)
}
