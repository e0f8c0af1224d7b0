package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, KmvSketch}
import graft.ops.{Expectations, Kmv}

/** X150 — the data-quality contract gate maintained INCREMENTALLY over
  * an unbounded stream: X149's one-pass expectations audit as a global
  * streaming aggregate in complete mode. Five of the six contracts
  * (null key, categorical domain, positive measure, non-empty text,
  * key format) are plain conditional counts — O(1) state, trivially
  * streaming. The sixth — key uniqueness — is exactly the contract a
  * stream CANNOT afford exactly (countDistinct over an unbounded key
  * stream is unbounded state, and Spark rejects it in streaming), so
  * the monitor swaps in the sketch family's answer: a bounded
  * [[graft.functions.KmvSketch]] over the hashed keys estimates
  * distinct ids in K longs, and est_dups = max(n_rows − est_ids, 0)
  * is the live duplicate-volume alarm (exact below capacity — the
  * X134 losslessness convention — and within the 1/√(K−2) band above;
  * the nightly batch X149 run remains the exact word).
  *
  * State is ONE row total (a global aggregate: the conditional counts
  * plus one ≤K-slot buffer), every trigger emits the contract
  * verdicts-so-far, and micro-batch slicing is irrelevant (counts are
  * additive, the sketch merges by bottom-k union) —
  * StreamExpectationsSpec pins streamed ≡ batch across a boundary,
  * the five exact counts ≡ X149's batch audit, and state_rows == 1.
  *
  * Null keys hash a sentinel string so the sketch input is total; the
  * null-key volume is already counted exactly by its own contract.
  */
object StreamExpectations {

  /** One-row contract monitor over a (streaming or batch) documents
    * frame. Emits n_rows, the five exact violation counts, and the
    * sketch-estimated distinct-key/duplicate columns.
    */
  def expectationsMonitor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kmv = udaf(new KmvSketch(Kmv.K))
    docs
      .select($"doc_id", $"lang", $"n_chars", $"text", $"source",
        Hashing.md5Long40(
          coalesce($"doc_id".cast("string"), lit("<null>"))).as("hid"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(when($"doc_id".isNull, 1L).otherwise(0L)).as("v_null_id"),
        // NULL counts as a violation (X149's contract — see
        // Expectations.auditOf): NOT IN / rlike over NULL would
        // otherwise greenlight null categorical/key-format columns
        sum(when($"lang".isNull ||
          !$"lang".isin(Expectations.LangDomain: _*), 1L)
          .otherwise(0L)).as("v_lang"),
        sum(when($"n_chars" <= 0L, 1L).otherwise(0L)).as("v_chars"),
        sum(when(length(trim($"text")) === 0, 1L).otherwise(0L))
          .as("v_text"),
        sum(when($"source".isNull ||
          !$"source".rlike("^src[0-9]+$"), 1L).otherwise(0L))
          .as("v_src"),
        kmv($"hid").as("ks"))
      .select($"n_rows", $"v_null_id", $"v_lang", $"v_chars",
        $"v_text", $"v_src",
        size($"ks").cast("long").as("k_used"),
        when(size($"ks") < Kmv.K, size($"ks").cast("double"))
          .otherwise((lit((Kmv.K - 1).toDouble) *
            lit((1L << 40).toDouble)) /
            element_at($"ks", size($"ks")).cast("double")).as("est_ids"))
      .withColumn("est_dups",
        greatest($"n_rows".cast("double") - $"est_ids", lit(0.0)))
  }
}
