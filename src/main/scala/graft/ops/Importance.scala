package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X142 — hashed n-gram importance weights (DSIR-style, whole-bit
  * exact): per-document log importance weight log p_target/p_raw under
  * hashed unigram bucket models — the data-selection score behind
  * "sample web data that looks like the target domain" (Xie et al.
  * 2023, Data Selection via Importance Resampling), here with the
  * target slice declared as the `lang = 'en'` sub-corpus and the raw
  * model as the whole corpus.
  *
  * Exactness — the X98 "bits, not nats" stance: DSIR's
  * log w(doc) = Σ_tokens [log p_t(b) − log p_r(b)] is an
  * order-dependent float sum (the divergence x53's scaladoc rejects);
  * its WHOLE-BIT version replaces each log₂ with bitlen via
  * `length(bin(x))` (minimal-width binary in BOTH engines, the X140
  * device), giving the per-bucket integer weight
  *
  *   w_b = [bitlen(t_b+1) − bitlen(T+B)] − [bitlen(r_b+1) − bitlen(R+B)]
  *
  * (+1/B add-one smoothing keeps every operand ≥ 1) and the per-doc
  * score Σ c_doc(b)·w_b — pure i64, order-independent, hash-green.
  * Resolution is one bit (a factor of 2 in the ratio), the right grain
  * for a selection score read as "this doc is ~2^w more target-like";
  * a target ≡ raw degenerate model gives exactly 0 for every doc (the
  * spec pins it).
  *
  * Scale shape: tokenization is a row-local split (three passes here:
  * two model builds + the scoring pass; at deployment the B-bounded
  * model tables are built once per corpus snapshot and amortized across
  * scoring runs). Both bucket models are B = 4096-group
  * map-side-combined aggregates (bounded state — the POINT of hashing
  * DSIR's features: the model is a fixed-size table no matter the
  * corpus); the weight table is B-bounded and BROADCAST (class `fixed`
  * — B is a code constant, with two one-row totals); the per-doc score
  * is ONE doc-keyed aggregate over the weighted token stream. No
  * vocabulary materialized, no corpus×vocab product, nothing grows
  * with corpus size but the one doc-keyed shuffle every per-doc op
  * pays.
  *
  * Reference scope: no curation scoring in the reference; engine
  * extension (SURVEY §2.5, the X22/X28/X29/X46 curation-mixing family —
  * X142 supplies the target-likeness score those quota/mixture ops
  * consume).
  */
object Importance {

  /** Hash-bucket count for the feature models (2¹² — code constant). */
  val B = 4096
  /** Target-slice predicate: the high-resource sub-corpus to match. */
  val TargetLang = "en"

  def importanceWeights(spark: SparkSession, dir: String): DataFrame =
    weightsOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text")))

  /** Core of X142 over any (doc_id, lang, text) frame; test seam. */
  private[graft] def weightsOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs
      .select($"doc_id", $"lang",
        explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .select($"doc_id", $"lang",
        Hashing.md5Long40($"word").bitwiseAND(lit((B - 1).toLong)).as("b"))
    val raw = tok.groupBy($"b").agg(count(lit(1)).as("r"))
    val tgt = tok.filter($"lang" === TargetLang)
      .groupBy($"b").agg(count(lit(1)).as("t"))
    val rTot = raw.agg(sum($"r").as("n_raw"))
    val tTot = tgt.agg(coalesce(sum($"t"), lit(0L)).as("n_tgt"))
    def bitlen(c: org.apache.spark.sql.Column) =
      length(bin(c)).cast("long")
    val wb = raw
      .join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(rTot))
      .crossJoin(broadcast(tTot))
      .select($"b",
        (bitlen(coalesce($"t", lit(0L)) + 1L) +
          bitlen($"n_raw" + B.toLong) -
          bitlen($"r" + 1L) -
          bitlen($"n_tgt" + B.toLong)).as("w"))
    tok
      .join(broadcast(wb), Seq("b"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_feats"), sum($"w").as("w_bits"))
      .orderBy($"doc_id")
  }

  val importanceWeightsSql: String = {
    val h = Hashing.sqlMd5Long40("word")
    s"""WITH tok AS (
       |  SELECT doc_id, lang, $h & ${B - 1} AS b
       |  FROM (SELECT doc_id, lang,
       |               unnest(string_split_regex(lower(text), '\\s+'))
       |                 AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |raw AS (SELECT b, count(*) AS r FROM tok GROUP BY b),
       |tgt AS (SELECT b, count(*) AS t FROM tok
       |        WHERE lang = '$TargetLang' GROUP BY b),
       |rtot AS (SELECT sum(r) AS n_raw FROM raw),
       |ttot AS (SELECT coalesce(sum(t), 0) AS n_tgt FROM tgt),
       |wb AS (
       |  SELECT raw.b,
       |         (length(bin(coalesce(tgt.t, 0) + 1))
       |            + length(bin(rtot.n_raw + $B)))
       |           - (length(bin(raw.r + 1))
       |                + length(bin(ttot.n_tgt + $B))) AS w
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b
       |  CROSS JOIN rtot CROSS JOIN ttot)
       |SELECT tok.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |       CAST(sum(wb.w) AS BIGINT) AS w_bits
       |FROM tok JOIN wb ON tok.b = wb.b
       |GROUP BY tok.doc_id
       |ORDER BY tok.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x142_importance_weights" -> importanceWeights _)

  val oracles: Map[String, String] = Map(
    "x142_importance_weights" -> importanceWeightsSql)
}
