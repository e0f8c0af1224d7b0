package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X98 — integer bigram surprisal scoring: score every document by how
  * SURPRISING its token bigrams are under the trusted [[RefLang]]
  * reference slice's bigram model — the n-gram-LM perplexity filter
  * (fluency-rank documents, drop the gibberish tail) with the log kept
  * EXACT by measuring in whole bits. X49 counts model COVERAGE (hit
  * ratios); X98 prices each bigram by its conditional improbability —
  * a rare-but-valid continuation costs more than "of the", and an
  * unmodeled continuation costs the full unigram back-off. The two are
  * the complementary halves of the n-gram quality family.
  *
  * Exactness — bits, not nats: true surprisal `−log₂ P(w₂|w₁)` =
  * `log₂ U(w₁) − log₂ B(w₁w₂)` is a float; its WHOLE-BIT version
  * `bitlen(U(w₁)) − bitlen(B(w₁w₂))` (bitlen x = ⌊log₂ x⌋ + 1 =
  * `length(bin(x))`, an integer both engines compute identically from
  * the binary string representation) carries the same ranking signal
  * within ±1 bit per bigram and sums in i64 — no libm, no
  * accumulation-order hazard, hash-gate exact. Non-negative because a
  * bigram occurrence consumes a w₁ occurrence, so B ≤ U and bitlen is
  * monotone. Back-off is priced the same way: a modeled first word
  * with an unmodeled continuation costs `bitlen(U(w₁))` (as if B = 1);
  * a fully OOV bigram costs the flat [[OovBits]].
  *
  * Scale shape: the X49 shape exactly — row-local fused bigram
  * generation (no positional self-join), a reference-vocabulary-bounded
  * model aggregate on each of the bigram and first-word keys, one left
  * join per model against the per-doc bigram partials, then a per-doc
  * rollup. The models scale with reference vocabulary, not corpus size
  * — AQE broadcasts them when they fit.
  *
  * Reference scope: no LM ops in the reference; engine extension
  * (SURVEY §2.5, the X49/X50 LM-statistics family).
  */
object Surprisal {

  val RefLang = "en"
  /** Flat whole-bit price of a fully out-of-model bigram — chosen above
    * any in-model cost at testdata scale (bitlen(U) ≤ ~13 here) so OOV
    * always ranks as the most surprising continuation.
    */
  val OovBits = 24L

  def surprisal(spark: SparkSession, dir: String): DataFrame =
    surprisalOf(Tables.documents(spark, dir), RefLang)

  /** bitlen(x) = ⌊log₂ x⌋ + 1 for x ≥ 1 — the length of the binary
    * string representation, identical in Spark (`bin`) and DuckDB
    * (`bin`).
    */
  private def bitlen(c: Column): Column = length(bin(c)).cast("long")

  /** Core of X98 over any (doc_id, lang, text) frame; test seam. */
  private[graft] def surprisalOf(docs: DataFrame, refLang: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    def bigrams(col: Column) =
      Hashing.skipGramPairs(col, 1, canonical = false)
    val tokenized = docs.select($"doc_id", $"lang",
      split(trim(lower($"text")), "\\s+").as("w"))
    val docBigrams = tokenized
      .select($"doc_id", explode(bigrams($"w")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("n"))
      .withColumn("w1", split($"bg", " ").getItem(0))
    val refBigrams = tokenized.filter($"lang" === refLang)
      .select(explode(bigrams($"w")).as("bg"))
    val bgModel = refBigrams
      .groupBy($"bg").agg(count(lit(1)).as("bc"))
    // U(w1) as the bigram-START count, so B(w1, ·) ≤ U(w1) holds by
    // construction (each doc's final token starts no bigram)
    val ugModel = refBigrams
      .select(split($"bg", " ").getItem(0).as("w1"))
      .groupBy($"w1").agg(count(lit(1)).as("uc"))
    docBigrams
      .join(bgModel, Seq("bg"), "left")
      .join(ugModel, Seq("w1"), "left")
      .withColumn("bits",
        when($"bc".isNotNull, bitlen($"uc") - bitlen($"bc"))
          .when($"uc".isNotNull, bitlen($"uc"))
          .otherwise(lit(OovBits)))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_bigrams"),
        sum($"n" * $"bits").as("total_bits"),
        sum(when($"bc".isNull && $"uc".isNull, $"n").otherwise(0L))
          .as("n_oov"))
      .select($"doc_id", $"n_bigrams", $"total_bits", $"n_oov",
        ($"total_bits".cast("double") / $"n_bigrams".cast("double"))
          .as("bits_per_bigram"))
      .orderBy($"doc_id")
  }

  val surprisalSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, lang, generate_subscripts(w, 1) AS pos,
       |         unnest(w) AS term
       |  FROM t),
       |bg AS (
       |  SELECT a.doc_id, a.lang, a.term AS w1,
       |         a.term || ' ' || b.term AS bg
       |  FROM tok a JOIN tok b
       |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |db AS (
       |  SELECT doc_id, bg, min(w1) AS w1, count(*) AS n
       |  FROM bg GROUP BY doc_id, bg),
       |bgm AS (
       |  SELECT bg, count(*) AS bc FROM bg WHERE lang = '$RefLang'
       |  GROUP BY 1),
       |ugm AS (
       |  SELECT w1, count(*) AS uc FROM bg WHERE lang = '$RefLang'
       |  GROUP BY 1),
       |j AS (
       |  SELECT d.doc_id, d.n,
       |         CASE WHEN m.bc IS NOT NULL
       |                THEN length(bin(u.uc)) - length(bin(m.bc))
       |              WHEN u.uc IS NOT NULL THEN length(bin(u.uc))
       |              ELSE $OovBits END AS bits,
       |         CASE WHEN m.bc IS NULL AND u.uc IS NULL
       |              THEN d.n ELSE 0 END AS oov
       |  FROM db d
       |  LEFT JOIN bgm m ON d.bg = m.bg
       |  LEFT JOIN ugm u ON d.w1 = u.w1)
       |SELECT doc_id,
       |       CAST(sum(n) AS BIGINT) AS n_bigrams,
       |       CAST(sum(n * bits) AS BIGINT) AS total_bits,
       |       CAST(sum(oov) AS BIGINT) AS n_oov,
       |       CAST(sum(n * bits) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
       |         AS bits_per_bigram
       |FROM j
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x98_bigram_surprisal" -> surprisal _)

  val oracles: Map[String, String] = Map(
    "x98_bigram_surprisal" -> surprisalSql)
}
