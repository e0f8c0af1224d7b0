package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X131 — duplicate-rate estimation with Wilson score intervals: each
  * source's exact-duplicate rate (X1 semantics: a doc is a duplicate
  * iff its content hash appears ≥ 2 times in the corpus) with a 95%
  * confidence band that stays honest at small n — the decision layer
  * over the raw rate (X7/X25 report point estimates; a 40-doc source
  * at 5% dup and a 40k-doc source at 5% dup deserve opposite
  * treatment, and the Wilson band is what says so; the normal
  * approximation interval collapses to a lie at p ≈ 0, exactly where
  * dup rates live).
  *
  * Parity: n and k are exact i64 counts (ONE content-hash aggregate,
  * re-joined to docs — the X1 shape); the band is the textbook Wilson
  * form
  *
  *   (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)
  *
  * evaluated as the IDENTICAL expression tree over identical doubles
  * in both engines (exact-int casts, literal constants parse to the
  * same IEEE values, every op correctly rounded — the X4 float
  * license). k = 0 is not special-cased: Wilson's lower bound is
  * nonnegative in exact arithmetic, and the last-ULP negative crumb
  * the float form can leave at p̂ = 0 (√(z²) ≠ z by one ulp) is
  * clamped with an identical greatest(·, 0) both engines.
  *
  * Scale shape: one md5-keyed count aggregate (map-side combined, a
  * 32-byte shuffle key independent of doc size), one broadcast-free
  * hash-join back on the content hash, one source-keyed aggregate.
  * Output is #sources rows. Nothing global but the final ORDER BY.
  *
  * Reference scope: no dedup in the reference; engine extension
  * (SURVEY §2.5, the X1/X7/X75 dedup-telemetry family).
  */
object Wilson {

  /** z and z² for the 95% band (literals — identical both engines). */
  val Z = 1.96
  val Z2 = 3.8416

  def dupRateWilson(spark: SparkSession, dir: String): DataFrame =
    dupRateWilsonOf(Tables.documents(spark, dir))

  /** Core of X131 over any (source, doc_id, text) frame; ScaleBench
    * seam. */
  private[graft] def dupRateWilsonOf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val docs = documents
      .select($"source", $"doc_id", md5($"text").as("h"))
    val dupHashes = docs.groupBy($"h").agg(count(lit(1)).as("cnt"))
    val flagged = docs.join(dupHashes, Seq("h"))
      .select($"source", ($"cnt" >= 2).cast("long").as("is_dup"))
    flagged.groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"is_dup").as("n_dup"))
      .withColumn("p_q",
        $"n_dup".cast("double") / $"n_docs".cast("double"))
      .withColumn("wilson_lo", greatest(lit(0.0),
        (($"p_q" + lit(Z2) / (lit(2.0) * $"n_docs".cast("double"))) -
          lit(Z) * sqrt(($"p_q" * (lit(1.0) - $"p_q")) /
              $"n_docs".cast("double") +
            lit(Z2) / (lit(4.0) * $"n_docs".cast("double") *
              $"n_docs".cast("double")))) /
          (lit(1.0) + lit(Z2) / $"n_docs".cast("double"))))
      .withColumn("wilson_hi",
        (($"p_q" + lit(Z2) / (lit(2.0) * $"n_docs".cast("double"))) +
          lit(Z) * sqrt(($"p_q" * (lit(1.0) - $"p_q")) /
              $"n_docs".cast("double") +
            lit(Z2) / (lit(4.0) * $"n_docs".cast("double") *
              $"n_docs".cast("double")))) /
          (lit(1.0) + lit(Z2) / $"n_docs".cast("double")))
      .select($"source", $"n_docs", $"n_dup", $"p_q",
        $"wilson_lo", $"wilson_hi")
      .orderBy($"source")
  }

  val dupRateWilsonSql: String = {
    val n = "CAST(n_docs AS DOUBLE)"
    val core = s"""(p_q + $Z2 / (2.0 * $n))"""
    val rad = s"""sqrt((p_q * (1.0 - p_q)) / $n
                 |            + $Z2 / (4.0 * $n * $n))""".stripMargin
    s"""WITH d AS (
       |  SELECT source, doc_id, md5(text) AS h FROM documents),
       |dh AS (SELECT h, count(*) AS cnt FROM d GROUP BY h),
       |f AS (
       |  SELECT d.source,
       |         CASE WHEN dh.cnt >= 2 THEN 1 ELSE 0 END AS is_dup
       |  FROM d JOIN dh ON d.h = dh.h),
       |a AS (
       |  SELECT source, count(*) AS n_docs, sum(is_dup) AS n_dup
       |  FROM f GROUP BY source),
       |p AS (
       |  SELECT source, n_docs, n_dup,
       |         CAST(n_dup AS DOUBLE) / CAST(n_docs AS DOUBLE) AS p_q
       |  FROM a)
       |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(n_dup AS BIGINT) AS n_dup, p_q,
       |       greatest(0.0,
       |         ($core - $Z * $rad) / (1.0 + $Z2 / $n)) AS wilson_lo,
       |       ($core + $Z * $rad) / (1.0 + $Z2 / $n) AS wilson_hi
       |FROM p
       |ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x131_dup_rate_wilson" -> dupRateWilson _)

  val oracles: Map[String, String] = Map(
    "x131_dup_rate_wilson" -> dupRateWilsonSql)
}
