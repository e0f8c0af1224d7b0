package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X114 — signed feature hashing (the hashing trick): every document's
  * token stream vectorized into a fixed [[Buckets]]-bucket sparse
  * feature matrix with ±1 signs — the vocabulary-FREE text vectorizer
  * behind streaming-friendly classifiers and cheap dedup/similarity
  * screens (X59 needs a trained vocabulary and pays OOV; X104/X6 need
  * corpus df; the hashing trick needs NOTHING corpus-global: bucket
  * and sign are pure functions of the token, so the vectorizer is
  * row-local, schema-fixed, and identical on any corpus — including
  * tomorrow's).
  *
  * Hash discipline: bucket = `md5Long40("x114b|" || word) mod B`, sign
  * from an INDEPENDENT hash bit (`md5Long40("x114s|" || word) mod 2`)
  * — the Weinberger et al. construction: the signed sum makes hash
  * collisions cancel in expectation instead of biasing counts upward.
  * Both engines compute the identical portable hashes, so the output
  * is bit-equal, not approximately equal.
  *
  * Output is the SPARSE long-form matrix (doc_id, bucket, weight) —
  * the join-ready shape downstream trainers and similarity probes
  * consume; zero cells are absent by construction.
  *
  * Scale shape: tokenize + hash are row-local in the scan projection;
  * ONE (doc_id, bucket)-keyed map-side-combined aggregate; nothing
  * global but the final ORDER BY. The natural 100 TB vectorizer.
  *
  * Reference scope: no text ops in the reference; engine extension
  * (SURVEY §2.5, the X5/X59/X104 vectorization family).
  */
object FeatureHash {

  val Buckets = 64L

  def featureHash(spark: SparkSession, dir: String): DataFrame =
    featureHashOf(Tables.documents(spark, dir))

  /** Core of X114 over any (doc_id, text) frame; test seam. */
  private[graft] def featureHashOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id",
        explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .select($"doc_id",
        (Hashing.md5Long40(concat(lit("x114b|"), $"word")) % Buckets)
          .as("bucket"),
        when(Hashing.md5Long40(concat(lit("x114s|"), $"word")) % 2 === 0,
          lit(1L)).otherwise(lit(-1L)).as("s"))
      .groupBy($"doc_id", $"bucket")
      .agg(sum($"s").as("weight"))
      .filter($"weight" =!= 0)
      .orderBy($"doc_id", $"bucket")
  }

  val featureHashSql: String = {
    val hb = Hashing.sqlMd5Long40("'x114b|' || word")
    val hs = Hashing.sqlMd5Long40("'x114s|' || word")
    s"""WITH tok AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |  FROM documents),
       |h AS (
       |  SELECT doc_id,
       |         $hb % $Buckets AS bucket,
       |         CASE WHEN $hs % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM tok)
       |SELECT doc_id, bucket, CAST(sum(s) AS BIGINT) AS weight
       |FROM h
       |GROUP BY doc_id, bucket
       |HAVING sum(s) <> 0
       |ORDER BY doc_id, bucket""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x114_feature_hash" -> featureHash _)

  val oracles: Map[String, String] = Map(
    "x114_feature_hash" -> featureHashSql)
}
