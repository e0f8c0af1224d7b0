package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKLongPairs

/** X104 — per-document top-[[K]] keyword extraction: the [[K]] most
  * tf-idf-distinctive words of every document, scored in WHOLE BITS so
  * the ranking key is exact i64 — the doc-level tagging/labeling pass
  * of a curation pipeline (X6 emits the full (doc × term) tf-idf
  * matrix; X104 is the decision on top of it: WHICH few terms represent
  * each doc — routing, clustering seeds, index keys).
  *
  * Exactness — whole-bit idf (the X98 discipline): score =
  * `tf · (bitlen(N) − bitlen(df))` with bitlen x = ⌊log₂ x⌋ + 1 =
  * `length(bin(x))`, identical in both engines. df ≤ N keeps the idf
  * factor ≥ 0 (corpus-universal words score 0 — stopword suppression
  * for free); the float `tf·ln(N/df)` ranking X6 emits as a VALUE
  * cannot be a deterministic ORDER key, the whole-bit form can.
  *
  * Ties break on ascending word order via an exact vocabulary rank
  * (wid) computed ORDER-PRESERVINGLY without a global window: bucket
  * by the word's first code point (UTF-8 order = code-point order, so
  * (pid, word) asc ⟺ word asc), rank within bucket, add the bucket
  * offsets via the triangular broadcast join (the X97 two-phase
  * decomposition with a known, order-preserving key).
  *
  * Scale shape: tf/df are map-side-combined hash-aggs; the vocab table
  * (word, df, wid) is vocabulary-bounded and BROADCAST into the score
  * join; the top-k cut is the B56 [[TopKLongPairs]] bounded aggregate —
  * ≤ K pairs per (doc, map task) cross the wire, never the full scored
  * matrix through a window sort; words re-attach by wid through a
  * second broadcast of the vocab. N rides a broadcast 1-row aggregate
  * (the X6 idiom). Nothing global but the final ORDER BY.
  *
  * Reference scope: no text ops in the reference; engine extension
  * (SURVEY §2.5, the X5/X6/X50 term-statistics family).
  */
object Keywords {

  val K = 3

  def topKeywords(spark: SparkSession, dir: String): DataFrame =
    topKeywordsOf(Tables.documents(spark, dir))

  /** Core of X104 over any (doc_id, text) frame; test seam. */
  private[graft] def topKeywordsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tf = docs
      .select($"doc_id",
        explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"doc_id", $"word").agg(count(lit(1)).as("tf"))
    val dfT = tf.groupBy($"word").agg(count(lit(1)).as("df"))
    // order-preserving two-phase vocabulary rank: first code point
    // buckets the (bounded) vocab, (pid, word) asc ⟺ word asc
    val bucketed = dfT.withColumn("pid", ascii(substring($"word", 1, 1)))
    val local = bucketed.withColumn("lrk",
      row_number().over(Window.partitionBy($"pid").orderBy($"word")).cast("long"))
    val counts = bucketed.groupBy($"pid").agg(count(lit(1)).as("c"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    val vocab = local.join(broadcast(offsets), "pid")
      .select($"word", $"df", ($"off" + $"lrk").as("wid"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(broadcast(vocab), "word")
      .crossJoin(broadcast(nDocs))
      .select($"doc_id", $"wid",
        ($"tf" * (length(bin($"n_docs")) - length(bin($"df"))).cast("long"))
          .as("score"))
    val tk = udaf(new TopKLongPairs(K))
    scored
      .select($"doc_id", (-$"score").as("k1"), $"wid".as("k2"))
      .groupBy($"doc_id").agg(tk($"k1", $"k2").as("top"))
      .select($"doc_id", posexplode($"top"))
      .select($"doc_id", ($"pos" + 1).cast("long").as("rk"),
        $"col._2".as("wid"), (-$"col._1").as("score"))
      .join(broadcast(vocab.select($"wid", $"word")), "wid")
      .select($"doc_id", $"rk", $"word", $"score")
      .orderBy($"doc_id", $"rk")
  }

  val topKeywordsSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok GROUP BY 1, 2),
       |dft AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT t.doc_id, t.word,
       |         t.tf * (length(bin(n.n_docs)) - length(bin(d.df))) AS score
       |  FROM tf t JOIN dft d USING (word), n),
       |rk AS (
       |  SELECT doc_id, word, score,
       |         row_number() OVER (PARTITION BY doc_id
       |           ORDER BY score DESC, word ASC) AS rk
       |  FROM scored)
       |SELECT doc_id, CAST(rk AS BIGINT) AS rk, word,
       |       CAST(score AS BIGINT) AS score
       |FROM rk WHERE rk <= $K
       |ORDER BY doc_id, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x104_top_keywords" -> topKeywords _)

  val oracles: Map[String, String] = Map(
    "x104_top_keywords" -> topKeywordsSql)
}
