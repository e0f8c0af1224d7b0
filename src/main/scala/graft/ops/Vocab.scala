package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X50 — vocabulary coverage curve: the top-[[TopV]] corpus words with
  * rank, frequency, and CUMULATIVE token-share — the curve a tokenizer
  * vocabulary plan reads ("V entries cover p% of the token stream";
  * the remainder is the OOV mass a subword fallback must absorb).
  *
  * Scale shape: word counts partial-combine map-side; the top-V cut is
  * TakeOrderedAndProject (never a global sort); the corpus token total
  * is a partial-aggregated scalar (the one SinglePartition shape the
  * plan lint allows). Rank and cumulative sums over the top table are
  * computed with a TRIANGULAR broadcast nested-loop self-join of the
  * V-row table (V² = 10k pairs) instead of a global ordered window —
  * an un-partitioned window would funnel the whole vocab through one
  * task, which the plan lint rightly rejects; over a bounded top-k
  * table the triangular join is the partition-friendly form.
  *
  * Parity: ranks and cumulative counts are exact i64 (ties broken by
  * word); cum_share divides two bit-identical i64-derived doubles.
  */
object Vocab {

  val TopV = 100

  def vocabCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageOf(Tables.documents(spark, dir), TopV)

  /** Core of X50 over any (doc_id, text) frame; test seam. */
  def coverageOf(docs: DataFrame, topV: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // vocab-sized aggregate; cached — it feeds the top cut (twice, as
    // both self-join sides) and the corpus token total
    val counts = docs
      .select(explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
      .localCheckpoint()
    val totals = counts.agg(sum($"freq").as("total"))
    val top = counts.orderBy($"freq".desc, $"word".asc).limit(topV)
    val a = top.select($"word".as("a_word"), $"freq".as("a_freq"))
    val b = top.select($"word".as("b_word"), $"freq".as("b_freq"))
    a.join(b,
        ($"b_freq" > $"a_freq") ||
        ($"b_freq" === $"a_freq" && $"b_word" <= $"a_word"))
      .groupBy($"a_word", $"a_freq")
      .agg(count(lit(1)).as("rank"), sum($"b_freq").as("cum_freq"))
      .crossJoin(broadcast(totals))
      .select($"rank", $"a_word".as("word"), $"a_freq".as("freq"),
        ($"cum_freq".cast("double") / $"total".cast("double")).as("cum_share"))
      .orderBy($"rank")
  }

  val vocabCoverageSql: String =
    s"""WITH tok AS (
       |  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |c AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
       |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS total FROM c),
       |top AS (SELECT word, freq FROM c ORDER BY freq DESC, word ASC LIMIT $TopV)
       |SELECT CAST(row_number() OVER (ORDER BY freq DESC, word ASC) AS BIGINT) AS rank,
       |       word, freq,
       |       CAST(sum(freq) OVER (ORDER BY freq DESC, word ASC
       |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |         / CAST(total AS DOUBLE) AS cum_share
       |FROM top, tot
       |ORDER BY rank""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x50_vocab_coverage" -> vocabCoverage _)

  val oracles: Map[String, String] = Map(
    "x50_vocab_coverage" -> vocabCoverageSql)
}
