package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X65 — MinHash estimator calibration: for every LSH candidate pair,
  * compare the SKETCH's similarity estimate (matching signature
  * components / 16) against the exact shingle Jaccard, rolled up per
  * matching-component count — the measured answer to "how much do I
  * trust the sketch before paying for exact verification", and the
  * evidence behind X2's banding thresholds (b = 8 bands × r = 2 rows
  * at τ = 0.5). At 100 TB this report is what justifies replacing the
  * exact verify stage with a sketch-only screen (or not).
  *
  * The bucket key IS the integer component-match count 0..16 — the
  * estimate is `n_match/16`, so bucketing by n_match is exact-integer
  * banding with no float boundary anywhere. Per bucket: pair count,
  * the estimate, and the pooled exact Jaccard `Σ|∩| / Σ|∪|` (one
  * division of exact i64 sums — the x60 rule; a mean of per-pair
  * ratios would be order-dependent and weight-blind) plus min/max
  * per-pair Jaccard (order-independent picks of identically-computed
  * doubles).
  *
  * Shape: everything downstream of the (bucketed) candidate producer
  * moves candidate cardinality; the signature join is doc-keyed
  * against the one-row-per-doc sig table; the rollup leaves ≤ 17 rows
  * from the map side. Unlike X2 there is NO Jaccard floor — the
  * calibration spectrum needs the false-positive candidates too.
  */
object Calibration {

  def minhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared memoized verify output (unfiltered — this op is WHY the
    // memoized frame keeps the sub-threshold candidates); the signature
    // table rides the same memo for the component-match columns
    val sig = CorpusIndex.index(spark, dir).sig
    val exact = CorpusIndex.minhashScores(spark, dir)

    val nMatch = (0 until Dedup.nHashes)
      .map(j => when(col(s"qa.m$j") === col(s"qb.m$j"), 1L).otherwise(0L))
      .reduce(_ + _)
    exact
      .join(sig.as("qa"), $"doc_a" === col("qa.doc_id"))
      .join(sig.as("qb"), $"doc_b" === col("qb.doc_id"))
      .select($"doc_a", $"doc_b", nMatch.as("n_match"),
        $"n_common", ($"n_sh_a" + $"n_sh_b" - $"n_common").as("n_union"),
        $"jaccard")
      .groupBy($"n_match")
      .agg(count(lit(1)).as("n_pairs"),
        sum($"n_common").as("sum_common"),
        sum($"n_union").as("sum_union"),
        min($"jaccard").as("min_jaccard"),
        max($"jaccard").as("max_jaccard"))
      .select($"n_match",
        ($"n_match".cast("double") / Dedup.nHashes).as("est_jaccard"),
        $"n_pairs",
        ($"sum_common".cast("double") / $"sum_union".cast("double"))
          .as("pooled_jaccard"),
        $"min_jaccard", $"max_jaccard")
      .orderBy($"n_match")
  }

  val minhashCalibrationSql: String = {
    val nMatch = (0 until Dedup.nHashes)
      .map(j => s"CASE WHEN za.m$j = zb.m$j THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""${Dedup.lshCandidateCtes},
       |scored AS (
       |  SELECT i.doc_a, i.doc_b, ($nMatch) AS n_match,
       |         n_common, za.n_sh + zb.n_sh - n_common AS n_union,
       |         CAST(n_common AS DOUBLE)
       |           / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE)
       |           AS jaccard
       |  FROM inter i
       |  JOIN sig za ON za.doc_id = i.doc_a
       |  JOIN sig zb ON zb.doc_id = i.doc_b)
       |SELECT CAST(n_match AS BIGINT) AS n_match,
       |       CAST(n_match AS DOUBLE) / ${Dedup.nHashes} AS est_jaccard,
       |       count(*) AS n_pairs,
       |       CAST(sum(n_common) AS DOUBLE)
       |         / CAST(sum(n_union) AS DOUBLE) AS pooled_jaccard,
       |       min(jaccard) AS min_jaccard,
       |       max(jaccard) AS max_jaccard
       |FROM scored
       |GROUP BY n_match
       |ORDER BY n_match""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x65_minhash_calibration" -> minhashCalibration _)

  val oracles: Map[String, String] = Map(
    "x65_minhash_calibration" -> minhashCalibrationSql)
}
