package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X53 — corpus-mix drift: per-source TOTAL-VARIATION divergence between
  * the source's unigram distribution and the whole-corpus distribution —
  * the quantitative answer to "how far does each slice sit from the mix
  * we're training on", feeding mixture reweighting (x46) and curation
  * (x22) decisions.
  *
  * Exactness by construction: TV = ½ Σ_w |p_s(w) − p(w)| over ratios of
  * integer counts is algebraically rearranged onto a COMMON DENOMINATOR,
  *
  *   TV(s) = [ Σ_{w∈s} |c_sw·N − c_w·N_s|  +  (N − Σ_{w∈s} c_w)·N_s ]
  *           / (2·N_s·N)
  *
  * where the second term folds in every word ABSENT from the source
  * (|0 − c_w/N| mass) without materializing the source × vocabulary
  * cross product — the sums run only over (source, word) pairs that
  * exist. Every sum is exact integer arithmetic (i128-wide: decimal(38,0)
  * here, HUGEINT in the oracle — c_sw·N overflows i64 once N reaches
  * 100 TB token counts); the ONLY float steps are the final casts and
  * the division chain, written in the same operation order in both
  * engines so IEEE semantics give bit-identical doubles. The usual KL
  * formulation is rejected deliberately: its ln() terms would make the
  * reduction an order-dependent float sum (the x49 scaladoc's argument).
  *
  * Scale shape: one tokenize pass → (source, word) counts with map-side
  * partials; corpus word counts DERIVE from that aggregate (second
  * reduce over the same partitioning, no rescan); the value join is
  * word-keyed hash, co-partitioned with the aggregate that produced it;
  * per-source scalars ride a broadcast of |sources| rows. No windows,
  * no driver loops.
  */
object Divergence {

  def sourceDivergence(spark: SparkSession, dir: String): DataFrame =
    divergenceOf(Tables.documents(spark, dir))

  /** Core of X53 over any (source, text) frame; test seam. */
  def divergenceOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val srcWord = docs
      .select($"source",
        explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"source", $"word")
      .agg(count(lit(1)).as("c_sw"))
      .localCheckpoint() // feeds corpus counts, per-source totals, and the join

    val corpus = srcWord.groupBy($"word").agg(sum($"c_sw").as("c_w"))
    val perSource = srcWord.groupBy($"source").agg(sum($"c_sw").as("n_s"))
    val total = corpus.agg(sum($"c_w").as("n")) // one row

    val dec = "decimal(38,0)"
    srcWord.join(corpus, Seq("word"))
      .join(broadcast(perSource), Seq("source"))
      .crossJoin(broadcast(total))
      .groupBy($"source")
      .agg(
        first($"n_s").as("n_tokens"),
        count(lit(1)).as("n_words"),
        first($"n").as("n_corpus"),
        sum(abs($"c_sw".cast(dec) * $"n" - $"c_w".cast(dec) * $"n_s"))
          .as("present_mass"),
        sum($"c_w".cast(dec)).as("covered"))
      .select($"source", $"n_tokens", $"n_words",
        (($"present_mass" + ($"n_corpus".cast(dec) - $"covered") * $"n_tokens")
          .cast("double") / lit(2.0)
          / $"n_tokens".cast("double") / $"n_corpus".cast("double"))
          .as("tv_divergence"))
      .orderBy($"source")
  }

  val sourceDivergenceSql: String =
    """WITH tok AS (
      |  SELECT source,
      |         unnest(string_split_regex(trim(lower(text)), '\s+')) AS word
      |  FROM documents),
      |sw AS (SELECT source, word, count(*) AS c_sw FROM tok GROUP BY 1, 2),
      |cw AS (SELECT word, CAST(sum(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY 1),
      |ns AS (SELECT source, CAST(sum(c_sw) AS BIGINT) AS n_s FROM sw GROUP BY 1),
      |tot AS (SELECT CAST(sum(c_w) AS BIGINT) AS n FROM cw),
      |agg AS (
      |  SELECT sw.source,
      |         CAST(first(ns.n_s) AS BIGINT) AS n_tokens,
      |         count(*) AS n_words,
      |         CAST(first(tot.n) AS BIGINT) AS n_corpus,
      |         sum(abs(CAST(sw.c_sw AS HUGEINT) * tot.n
      |                 - CAST(cw.c_w AS HUGEINT) * ns.n_s)) AS present_mass,
      |         sum(CAST(cw.c_w AS HUGEINT)) AS covered
      |  FROM sw
      |  JOIN cw USING (word)
      |  JOIN ns ON sw.source = ns.source
      |  CROSS JOIN tot
      |  GROUP BY sw.source)
      |SELECT source, n_tokens, n_words,
      |       CAST(present_mass + (CAST(n_corpus AS HUGEINT) - covered)
      |              * n_tokens AS DOUBLE) / 2.0
      |         / CAST(n_tokens AS DOUBLE) / CAST(n_corpus AS DOUBLE)
      |         AS tv_divergence
      |FROM agg
      |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x53_source_divergence" -> sourceDivergence _)

  val oracles: Map[String, String] = Map(
    "x53_source_divergence" -> sourceDivergenceSql)
}
