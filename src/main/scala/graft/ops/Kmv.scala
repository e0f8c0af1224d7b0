package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X134 — KMV (k-minimum-values) distinct-content sketch per source,
  * the ORACLE-CHECKABLE cardinality estimator: b11's HLL is
  * implementation-defined (rows-only check, by declared design); KMV's
  * entire state is "the k smallest hash values", a pure deterministic
  * function of the data — so the approximate estimator itself gets a
  * full hash-green oracle row, and the sketch can serve as the audited
  * reference point for the rest of the approximate family (the X92
  * role, played for cardinality). The estimate is the classic
  * (k−1)·H/h₍ₖ₎ (Bar-Yossef et al. 2002; Beyer et al. 2007) with
  * H = 2⁴⁰, the engine-portable md5Long40 hash space.
  *
  * Exactness of the approximation: h₍ₖ₎ is the k-th smallest DISTINCT
  * hash — an order statistic (integer selection, the B51/X126/X129
  * stance), so both engines agree on it bit-for-bit, and the estimate
  * is one double division of exact i64 operands. A source with fewer
  * than k distinct hashes reports its exact distinct count (the sketch
  * is lossless below capacity — est = exact by definition, not a
  * special case of the formula). The spec pins the relative error on
  * the real corpus within the theoretical ~1/√(k−2) band.
  *
  * Scale shape: one (source, h) DISTINCT aggregate (map-side partials,
  * 40-bit shuffle keys independent of doc size); the k minima ride a
  * per-SOURCE rank window over the distinct-hash stream (at warehouse
  * scale the same cut is a (source)-grouped TopK aggregate — B56's
  * bounded form with inverted order); one source-keyed aggregate
  * after. Output is #sources rows. The mergeability that makes KMV a
  * 100 TB sketch (union of k-minima sets → take k smallest) is the
  * same order-statistic algebra the plan's partial aggregation uses.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, the B11/X45/X47 sketch family).
  */
object Kmv {

  val K = 64

  def kmvDistinctContent(spark: SparkSession, dir: String): DataFrame =
    kmvOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("text").as("v")))

  /** Core of X134 over any (grp, v) frame; test seam. */
  private[graft] def kmvOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val hashes = rows
      .select($"grp", graft.functions.Hashing.md5Long40($"v").as("h"))
      .distinct()
    val ranked = hashes
      .withColumn("rn", row_number().over(
        Window.partitionBy($"grp").orderBy($"h")).cast("long"))
      .withColumn("nd", count(lit(1)).over(
        Window.partitionBy($"grp")).cast("long"))
    ranked
      .filter($"rn" <= K)
      .groupBy($"grp")
      .agg(max($"nd").as("n_distinct"),
        count(lit(1)).as("k_used"),
        max($"h").as("kth_hash"))
      .withColumn("est_q",
        when($"n_distinct" < K, $"n_distinct".cast("double"))
          .otherwise((lit((K - 1).toDouble) * lit((1L << 40).toDouble)) /
            $"kth_hash".cast("double")))
      .orderBy($"grp")
  }

  val kmvDistinctContentSql: String = {
    val h = graft.functions.Hashing.sqlMd5Long40("v")
    s"""WITH hs AS (
       |  SELECT DISTINCT grp, h FROM (
       |    SELECT source AS grp, $h AS h
       |    FROM (SELECT source, text AS v FROM documents))),
       |r AS (
       |  SELECT grp, h,
       |         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
       |         count(*) OVER (PARTITION BY grp) AS nd
       |  FROM hs)
       |SELECT grp, CAST(max(nd) AS BIGINT) AS n_distinct,
       |       CAST(count(*) AS BIGINT) AS k_used,
       |       CAST(max(h) AS BIGINT) AS kth_hash,
       |       CASE WHEN max(nd) < $K THEN CAST(max(nd) AS DOUBLE)
       |            ELSE (CAST(${K - 1} AS DOUBLE)
       |                    * CAST(${1L << 40} AS DOUBLE))
       |                   / CAST(max(h) AS DOUBLE) END AS est_q
       |FROM r WHERE rn <= $K
       |GROUP BY grp
       |ORDER BY grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x134_kmv_distinct" -> kmvDistinctContent _)

  val oracles: Map[String, String] = Map(
    "x134_kmv_distinct" -> kmvDistinctContentSql)
}
