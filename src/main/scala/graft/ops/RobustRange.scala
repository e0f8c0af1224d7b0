package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X129 — per-dimension robust range profile of the embedding space:
  * exact lower-quartile / median / upper-quartile (and IQR) of every
  * dimension — the outlier-fence and robust-scaling input that X64's
  * moment profile cannot give (means and stds move with every outlier;
  * quartiles don't — and PQ/IVF training (X31/X19) as well as
  * quantization range choice (X48) want the robust spread, not the
  * moment spread).
  *
  * Exactness — order statistics over quantized values (the B51/X126
  * stance: an exact corpus value, not an interpolation): elements map
  * once to q = floor(x·10⁶) (i64, the X48 scale), and the three cuts
  * are the k-th smallest by the (q, vec_id) total order with
  * k = (n+1) div 4, (n+1) div 2, 3(n+1) div 4 — integer selections,
  * bit-equal both engines; iqr = q3 − q1 exactly.
  *
  * Scale shape: quantization is row-local in the exploded scan; ranks
  * are per-DIMENSION windows (D partitions — at D = 64 each holds the
  * corpus column; for very large corpora the same query runs the
  * two-phase rank X104 uses per dim); ONE dim-keyed conditional
  * aggregate collapses the three cuts. Nothing global but the D-row
  * ORDER BY.
  *
  * Reference scope: no vector ops in the reference; engine extension
  * (SURVEY §2.5, the X48/X64/X113 embedding-analytics family).
  */
object RobustRange {

  /** Quantization scale (the X48 int-range discipline). */
  val Q = 1000000.0

  def dimRobustRange(spark: SparkSession, dir: String): DataFrame =
    robustRangeOf(Tables.embeddings(spark, dir))

  /** Core of X129 over any (vec_id, embedding) frame; test seam. */
  private[graft] def robustRangeOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tok = embeddings
      .select($"vec_id", posexplode($"embedding").as(Seq("dim", "x")))
      .select($"vec_id", $"dim".cast("long").as("dim"),
        floor($"x".cast("double") * Q).cast("long").as("q"))
    val w = Window.partitionBy($"dim").orderBy($"q", $"vec_id")
    tok
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy($"dim")).cast("long"))
      .filter(expr("rn = (n + 1) div 4 or rn = (n + 1) div 2 " +
        "or rn = (3 * (n + 1)) div 4"))
      .groupBy($"dim")
      .agg(max($"n").as("n"),
        max(expr("CASE WHEN rn = (n + 1) div 4 THEN q END")).as("q1"),
        max(expr("CASE WHEN rn = (n + 1) div 2 THEN q END")).as("med"),
        max(expr("CASE WHEN rn = (3 * (n + 1)) div 4 THEN q END")).as("q3"))
      .select($"dim", $"n", $"q1", $"med", $"q3",
        ($"q3" - $"q1").as("iqr"))
      .orderBy($"dim")
  }

  val dimRobustRangeSql: String =
    s"""WITH tok AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT)
       |           AS dim,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $Q)
       |           AS BIGINT) AS q
       |  FROM embeddings),
       |r AS (
       |  SELECT dim, q,
       |         row_number() OVER (PARTITION BY dim ORDER BY q, vec_id)
       |           AS rn,
       |         count(*) OVER (PARTITION BY dim) AS n
       |  FROM tok)
       |SELECT dim, CAST(max(n) AS BIGINT) AS n,
       |       CAST(max(CASE WHEN rn = (n + 1) // 4 THEN q END)
       |         AS BIGINT) AS q1,
       |       CAST(max(CASE WHEN rn = (n + 1) // 2 THEN q END)
       |         AS BIGINT) AS med,
       |       CAST(max(CASE WHEN rn = (3 * (n + 1)) // 4 THEN q END)
       |         AS BIGINT) AS q3,
       |       CAST(max(CASE WHEN rn = (3 * (n + 1)) // 4 THEN q END)
       |          - max(CASE WHEN rn = (n + 1) // 4 THEN q END)
       |         AS BIGINT) AS iqr
       |FROM r
       |WHERE rn = (n + 1) // 4 OR rn = (n + 1) // 2
       |   OR rn = (3 * (n + 1)) // 4
       |GROUP BY dim
       |ORDER BY dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x129_dim_robust_range" -> dimRobustRange _)

  val oracles: Map[String, String] = Map(
    "x129_dim_robust_range" -> dimRobustRangeSql)
}
