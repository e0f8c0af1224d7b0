package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X49 — reference-corpus bigram coverage scoring: the n-gram-LM
  * quality-filter family (score every document by how much its token
  * bigrams look like a trusted reference corpus) with the statistics
  * kept EXACT. The reference model is the bigram count table of the
  * [[RefLang]] slice; each document scores:
  *
  *   - `n_bigrams` — its bigram total,
  *   - `n_hits`    — bigrams present in the reference model,
  *   - `coverage`  — n_hits / n_bigrams (i64 ÷ i64 — one exact double),
  *   - `avg_hit_count` — mean reference frequency of its matched
  *     bigrams (i64 sums again) — separates "common English" from
  *     "rare-but-valid English".
  *
  * A full smoothed log-probability score would sum per-bigram `ln`
  * terms — a float reduction over libm outputs that no quantization
  * makes safely order-free at the hash gate; the integer sufficient
  * statistics here carry the same ranking signal and stay bit-exact.
  * (The ln-sum variant is a trivial consumer of these columns.)
  *
  * Scale shape: bigram generation is row-local (the X44 indexed
  * transform — no positional self-join); the reference model is a
  * (bigram → count) partial aggregate; scoring is ONE left join of the
  * doc-bigram partials against the model on the bigram key, then a
  * per-doc rollup. The model scales with reference vocabulary², not
  * corpus size — broadcast when it fits, shuffle-join when it doesn't
  * (AQE decides; nothing in the plan assumes broadcast).
  */
object LmScore {

  val RefLang = "en"

  def lmCoverage(spark: SparkSession, dir: String): DataFrame =
    coverageOf(Tables.documents(spark, dir), RefLang)

  /** Core of X49 over any (doc_id, lang, text) frame; test seam. */
  def coverageOf(docs: DataFrame, refLang: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ordered bigrams via the fused native pass (window=1, stream
    // order); the nested-lambda form is kept in Hashing for the pin
    def bigrams(col: org.apache.spark.sql.Column) =
      graft.functions.Hashing.skipGramPairs(col, 1, canonical = false)
    val tokenized = docs.select($"doc_id", $"lang",
      split(trim(lower($"text")), "\\s+").as("w"))
    val docBigrams = tokenized
      .select($"doc_id", $"lang", explode(bigrams($"w")).as("bg"))
      .groupBy($"doc_id", $"bg").agg(count(lit(1)).as("n"))
    val model = tokenized.filter($"lang" === refLang)
      .select(explode(bigrams($"w")).as("bg"))
      .groupBy($"bg").agg(count(lit(1)).as("ref_c"))
    docBigrams.join(model, Seq("bg"), "left")
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_bigrams"),
        sum(when($"ref_c".isNotNull, $"n").otherwise(0L)).as("n_hits"),
        sum(when($"ref_c".isNotNull, $"n" * $"ref_c").otherwise(0L)).as("hit_mass"))
      .select($"doc_id", $"n_bigrams", $"n_hits",
        ($"n_hits".cast("double") / $"n_bigrams".cast("double")).as("coverage"),
        when($"n_hits" > 0,
          $"hit_mass".cast("double") / $"n_hits".cast("double"))
          .as("avg_hit_count"))
      .orderBy($"doc_id")
  }

  val lmCoverageSql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, lang, generate_subscripts(w, 1) AS pos,
       |         unnest(w) AS term
       |  FROM t),
       |bg AS (
       |  SELECT a.doc_id, a.lang, a.term || ' ' || b.term AS bg
       |  FROM tok a JOIN tok b
       |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
       |db AS (
       |  SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2),
       |model AS (
       |  SELECT bg, count(*) AS ref_c FROM bg WHERE lang = '$RefLang'
       |  GROUP BY 1),
       |j AS (
       |  SELECT d.doc_id, d.n, m.ref_c
       |  FROM db d LEFT JOIN model m ON d.bg = m.bg)
       |SELECT doc_id,
       |       CAST(sum(n) AS BIGINT) AS n_bigrams,
       |       CAST(sum(CASE WHEN ref_c IS NOT NULL THEN n ELSE 0 END) AS BIGINT) AS n_hits,
       |       CAST(sum(CASE WHEN ref_c IS NOT NULL THEN n ELSE 0 END) AS DOUBLE)
       |         / CAST(sum(n) AS DOUBLE) AS coverage,
       |       CASE WHEN sum(CASE WHEN ref_c IS NOT NULL THEN n ELSE 0 END) > 0
       |            THEN CAST(sum(CASE WHEN ref_c IS NOT NULL THEN n * ref_c ELSE 0 END) AS DOUBLE)
       |               / CAST(sum(CASE WHEN ref_c IS NOT NULL THEN n ELSE 0 END) AS DOUBLE)
       |       END AS avg_hit_count
       |FROM j
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x49_lm_coverage" -> lmCoverage _)

  val oracles: Map[String, String] = Map(
    "x49_lm_coverage" -> lmCoverageSql)
}
