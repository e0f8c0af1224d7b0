package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X59 — tokenizer application: map every corpus word onto a fixed
  * [[VocabSize]]-entry vocabulary (the x50 coverage curve's top-V cut;
  * V sits deliberately below the synthetic corpus's distinct-word count
  * so the OOV path does real work at every scale factor),
  * falling back to CHARACTER count for out-of-vocabulary words — the
  * apply step that turns planned vocabulary (x50) into an actual
  * token-id stream, and the per-source OOV accounting that tells a
  * data-mix owner which slices will fragment into subword soup.
  *
  * Token-id assignment must be deterministic and engine-portable: ids
  * are the (freq DESC, word ASC) rank of the top-V cut — the same total
  * order x50 pins — computed here WITHOUT a global ordered window: the
  * vocab is bounded (V rows), so ranking is the x50 triangular
  * broadcast self-join, and the corpus-wide apply is ONE broadcast hash
  * join of the token stream against the V-row id table. An OOV word
  * contributes `length(word)` fallback units (the subword-count proxy:
  * the worst-case byte/char fallback every real tokenizer bottoms out
  * at), so `expanded_units = n_invocab + Σ length(oov)` measures the
  * real post-tokenization sequence cost per source.
  *
  * Scale shape: word counts partial-combine map-side; the top-V cut is
  * TakeOrderedAndProject; the apply join broadcasts V rows; per-source
  * rollup is one |sources| exchange. All counts exact i64.
  */
object Tokenizer {

  val VocabSize = 20

  def tokenizerApply(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"source",
        explode(split(trim(lower($"text")), "\\s+")).as("word"))

    // bounded top-V vocabulary with deterministic (freq DESC, word ASC)
    // rank — triangular self-join over V rows, never a global window
    val counts = toks.groupBy($"word").agg(count(lit(1)).as("freq"))
    val top = counts.orderBy($"freq".desc, $"word".asc).limit(VocabSize)
    val a = top.select($"word".as("a_word"), $"freq".as("a_freq"))
    val b = top.select($"word".as("b_word"), $"freq".as("b_freq"))
    val vocab = a.join(b,
        ($"b_freq" > $"a_freq") ||
        ($"b_freq" === $"a_freq" && $"b_word" <= $"a_word"))
      .groupBy($"a_word")
      .agg(count(lit(1)).as("token_id"))
      .select($"a_word".as("word"), $"token_id")

    toks.join(broadcast(vocab), Seq("word"), "left")
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_words"),
        sum(when($"token_id".isNotNull, 1L).otherwise(0L)).as("n_invocab"),
        sum(when($"token_id".isNull, 1L).otherwise(0L)).as("n_oov"),
        countDistinct($"token_id").as("ids_used"),
        sum(when($"token_id".isNotNull, lit(1L))
          .otherwise(length($"word").cast("long"))).as("expanded_units"))
      .withColumn("oov_rate",
        $"n_oov".cast("double") / $"n_words".cast("double"))
      .orderBy($"source")
  }

  val tokenizerApplySql: String =
    s"""WITH tok AS (
       |  SELECT source,
       |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |c AS (SELECT word, count(*) AS freq FROM tok GROUP BY 1),
       |top AS (SELECT word, freq FROM c ORDER BY freq DESC, word ASC
       |        LIMIT $VocabSize),
       |vocab AS (
       |  SELECT a.word, count(*) AS token_id
       |  FROM top a JOIN top b
       |    ON b.freq > a.freq OR (b.freq = a.freq AND b.word <= a.word)
       |  GROUP BY a.word)
       |SELECT source,
       |       count(*) AS n_words,
       |       CAST(sum(CASE WHEN token_id IS NOT NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_invocab,
       |       CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END)
       |         AS BIGINT) AS n_oov,
       |       count(DISTINCT token_id) AS ids_used,
       |       CAST(sum(CASE WHEN token_id IS NOT NULL THEN 1
       |                ELSE length(word) END) AS BIGINT) AS expanded_units,
       |       CAST(sum(CASE WHEN token_id IS NULL THEN 1 ELSE 0 END)
       |           AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate
       |FROM tok LEFT JOIN vocab USING (word)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x59_tokenizer_apply" -> tokenizerApply _)

  val oracles: Map[String, String] = Map(
    "x59_tokenizer_apply" -> tokenizerApplySql)
}
