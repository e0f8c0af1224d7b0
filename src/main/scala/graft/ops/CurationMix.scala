package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X153 — the end-to-end curation composition: contract gate (X149's
  * row-level expectations) → dedup verdicts (X22's quality/exact/near-dup
  * ledger, which itself rides X1/X10/X17/X18) → temperature-mixture
  * weights (X46) over the SURVIVORS, emitted as one per-language funnel
  * report — the single number-table a training-data build hands to the
  * sampler: how much raw data each language had, what the gate and the
  * dedupers removed, and how many draws the α-tempered mixture assigns
  * to what is left. Proves the quality, dedup, and mixing families
  * compose under ONE oracle instead of only individually.
  *
  * Stage semantics: a document survives iff it passes every ROW-LEVEL
  * X149 contract (key non-null, lang in domain, positive length,
  * non-empty text, source format — the corpus-level uniqueness contract
  * stays X149's own job) AND carries X22's `kept` verdict. The two
  * filters are row-local on independent columns, so gate∘dedup =
  * dedup∘gate — which is what lets the plan read the MEMOIZED
  * corpus-level verdict ledger ([[CorpusIndex.curationVerdicts]] — the
  * artifact a production build persists once per snapshot) instead of
  * re-running curation on the gated subset; on the driver corpora the
  * gate drops nothing (ExpectationsSpec pins the clean corpus), and on
  * a dirty corpus the funnel columns expose exactly what it dropped.
  *
  * Exactness: the funnel is conditional counts (exact i64); the weight
  * columns are X46's proven parity mechanism verbatim — p^α through
  * DECIMAL(27,6) before the ratio, one double division, floor to draws.
  *
  * Scale shape: one row-local contract scan joined to the persisted
  * verdict ledger on the key both sides already hash by; the funnel is
  * one |langs|-group aggregate with map-side partials; the weight table
  * is |langs| rows crossed with a broadcast one-row total. Nothing
  * corpus-sized moves except the one ledger join.
  *
  * Reference scope: no curation in the reference; engine extension
  * (SURVEY §2.5 — the X22 composition at the round-13 surface width).
  */
object CurationMix {

  def curationMix(spark: SparkSession, dir: String): DataFrame =
    mixOf(Tables.documents(spark, dir),
      CorpusIndex.curationVerdicts(spark, dir))

  /** Core of X153 over any documents-shaped frame and its verdict
    * ledger (doc_id, verdict); test seam for dirty corpora. */
  private[graft] def mixOf(docs: DataFrame,
      verdictLedger: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val langs = Expectations.LangDomain
    // NULL-total gate (round-13 advice item — the Expectations.auditOf
    // discipline): a NULL text or n_chars makes the raw conjunction
    // NULL, which would put the row in n_raw but in NO funnel bucket,
    // breaking funnel conservation (n_gate_fail + n_low_quality + n_dup
    // + n_kept = n_raw) on dirty corpora. coalesce(·, false) makes
    // every three-valued outcome a hard verdict.
    val gated = docs
      .select($"doc_id", $"lang",
        coalesce($"doc_id".isNotNull &&
          $"lang".isNotNull && $"lang".isin(langs: _*) &&
          $"n_chars" > 0L && length(trim($"text")) > 0 &&
          $"source".isNotNull && $"source".rlike("^src[0-9]+$"),
          lit(false))
          .as("gate_ok"))
    val verdicts = verdictLedger.select($"doc_id", $"verdict")
    // LEFT join: a row the ledger never saw (NULL doc_id, or a doc_id
    // the curation snapshot predates) must not vanish from n_raw — it
    // buckets as a gate failure (no verdict ⇒ not certifiable as kept)
    val funnel = gated.join(verdicts, Seq("doc_id"), "left")
      .withColumn("ok", $"gate_ok" && $"verdict".isNotNull)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_raw"),
        sum(when(!$"ok", 1L).otherwise(0L)).as("n_gate_fail"),
        sum(when($"ok" && $"verdict" === "low_quality", 1L)
          .otherwise(0L)).as("n_low_quality"),
        sum(when($"ok" &&
          $"verdict".isin("exact_dup", "near_dup"), 1L)
          .otherwise(0L)).as("n_dup"),
        sum(when($"ok" && $"verdict" === "kept", 1L)
          .otherwise(0L)).as("n_kept"))
      // X46's parity mechanism verbatim: p^α truncated to DECIMAL(27,6)
      // before any ratio (identical decimal operands ⇒ identical IEEE
      // quotients in both engines)
      .withColumn("p6",
        pow($"n_kept", lit(Mixing.TempAlpha)).cast("decimal(27,6)"))
    val totals = funnel.agg(sum($"n_kept").as("k_total"),
      sum($"p6").as("p_total"))
    funnel.crossJoin(broadcast(totals))
      .select($"lang", $"n_raw", $"n_gate_fail", $"n_low_quality",
        $"n_dup", $"n_kept",
        ($"n_kept".cast("double") / $"k_total".cast("double"))
          .as("share"),
        ($"p6".cast("double") / $"p_total".cast("double"))
          .as("alpha_weight"),
        floor($"p6".cast("double") / $"p_total".cast("double")
          * Mixing.DrawBudget).cast("long").as("expected_draws"))
      .orderBy($"lang")
  }

  val curationMixSql: String = {
    val langs = Expectations.LangDomain.map(l => s"'$l'").mkString(", ")
    s"""WITH RECURSIVE
       |${Curation.verdictCtes},
       |g AS (
       |  SELECT doc_id, lang,
       |         coalesce(doc_id IS NOT NULL AND lang IS NOT NULL
       |          AND lang IN ($langs) AND n_chars > 0
       |          AND length(trim(text)) > 0 AND source IS NOT NULL
       |          AND regexp_matches(source, '^src[0-9]+$$'), false)
       |           AS gate_ok
       |  FROM documents),
       |f AS (
       |  SELECT g.lang,
       |         CAST(count(*) AS BIGINT) AS n_raw,
       |         CAST(sum(CASE WHEN NOT gate_ok OR v.verdict IS NULL
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_gate_fail,
       |         CAST(sum(CASE WHEN gate_ok AND v.verdict = 'low_quality'
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_low_quality,
       |         CAST(sum(CASE WHEN gate_ok AND v.verdict IN
       |           ('exact_dup', 'near_dup') THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_dup,
       |         CAST(sum(CASE WHEN gate_ok AND v.verdict = 'kept'
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |  FROM g LEFT JOIN verdicts v ON g.doc_id = v.doc_id
       |  GROUP BY 1),
       |f6 AS (
       |  SELECT *, CAST(pow(n_kept, ${Mixing.TempAlpha})
       |    AS DECIMAL(27,6)) AS p6
       |  FROM f),
       |mt AS (
       |  SELECT CAST(sum(n_kept) AS BIGINT) AS k_total,
       |         sum(p6) AS p_total
       |  FROM f6)
       |SELECT lang, n_raw, n_gate_fail, n_low_quality, n_dup, n_kept,
       |       CAST(n_kept AS DOUBLE) / CAST(k_total AS DOUBLE) AS share,
       |       CAST(p6 AS DOUBLE) / CAST(p_total AS DOUBLE)
       |         AS alpha_weight,
       |       CAST(floor(CAST(p6 AS DOUBLE) / CAST(p_total AS DOUBLE)
       |         * ${Mixing.DrawBudget}) AS BIGINT) AS expected_draws
       |FROM f6, mt
       |ORDER BY lang""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x153_curation_mix" -> curationMix _)

  val oracles: Map[String, String] = Map(
    "x153_curation_mix" -> curationMixSql)
}
