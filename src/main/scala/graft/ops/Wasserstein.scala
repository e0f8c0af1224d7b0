package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X141 — exact Wasserstein-1 (earth-mover) drift: for each source, the
  * W₁ distance between ITS document-length distribution and the REST of
  * the corpus. The magnitude-aware complement to X117's KS on the SAME
  * spine: KS is max_t |F_in(t) − F_rest(t)| — it says the CDFs separate
  * but not by how much mass moved how far; W₁ = ∫|F_in − F_rest| dt is
  * the total work to morph one distribution into the other (in chars),
  * the number a mixing/curation decision actually weighs (a feed whose
  * docs all grew 40 chars and one whose 1% tail exploded can KS-tie;
  * their W₁ differ by orders of magnitude).
  *
  * Exactness — same denominator-clearing as X117: between consecutive
  * spine values the CDFs are constant, so the integral is the exact sum
  * Σ_t gap(t)·|cum_in(t)·n_rest − cum_rest(t)·n_in| over the union
  * value spine, all integers. Each term is formed as
  * DECIMAL(9,0)·DECIMAL(28,0) (→ ≤38 digits in BOTH engines' precision
  * rules — never an overflow, never a float until the end), summed in
  * decimal, and cast to DOUBLE once (the dsum discipline: correctly-
  * rounded in both engines, bit-exact below 2⁵³ — the gated corpora sit
  * ~2⁴¹ under that). w1_q = num/(n_in·n_rest) is one IEEE division.
  * A point mass shifted by d gives w1_q = d exactly; identical
  * distributions give exactly 0.
  *
  * Scale shape: the corpus is touched ONCE by the (source, value) count
  * aggregate (map-side partials); the spine is #sources × #distinct
  * values — value-bounded, not corpus-bounded; gap and the cumulative
  * sums ride the SAME per-source spine window X117 uses (lead and two
  * running sums in one window pass, never a global sort); one
  * source-keyed aggregate after. The final point of each spine carries
  * cross = 0 (both CDFs are 1), so the null lead is a true no-op.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, completing the drift family: X53 binned divergence,
  * X89 quantile re-norm, X115 categorical association, X117 KS
  * direction-free max gap, X141 mass-transport magnitude).
  */
object Wasserstein {

  def sourceLengthW1(spark: SparkSession, dir: String): DataFrame =
    w1Of(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("n_chars").as("v")))

  /** Core of X141 over any (grp, v:i64) frame; test seam. One row per
    * group: n_in, n_rest, exact-decimal W₁ numerator as double, float
    * quotient (units of v).
    */
  private[graft] def w1Of(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val cnt = rows.groupBy($"grp", $"v").agg(count(lit(1)).as("c"))
    val perValue = cnt.groupBy($"v").agg(sum($"c").as("c_all"))
    val perGrp = cnt.groupBy($"grp").agg(sum($"c").as("n_in"))
    val tot = cnt.agg(sum($"c").as("n_tot"))
    val spine = perValue
      .crossJoin(broadcast(perGrp))
      .join(cnt, Seq("grp", "v"), "left")
      .crossJoin(broadcast(tot))
      .select($"grp", $"v", $"n_in", ($"n_tot" - $"n_in").as("n_rest"),
        coalesce($"c", lit(0L)).as("c_in"), $"c_all")
    val w = Window.partitionBy($"grp").orderBy($"v")
    val cumW = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("gap", coalesce(lead($"v", 1).over(w) - $"v", lit(0L)))
      .withColumn("cum_in", sum($"c_in").over(cumW))
      .withColumn("cum_all", sum($"c_all").over(cumW))
      .withColumn("cross", abs($"cum_in" * $"n_rest" -
        ($"cum_all" - $"cum_in") * $"n_in"))
      .groupBy($"grp")
      .agg(max($"n_in").as("n_in"), max($"n_rest").as("n_rest"),
        sum($"gap".cast("decimal(9,0)") *
          $"cross".cast("decimal(28,0)")).cast("double").as("w1_num"))
      .select($"grp", $"n_in", $"n_rest", $"w1_num",
        when($"n_in" * $"n_rest" === 0, lit(0.0)).otherwise(
          $"w1_num" / ($"n_in" * $"n_rest").cast("double")).as("w1_q"))
      .orderBy($"grp")
  }

  val sourceLengthW1Sql: String =
    """WITH cnt AS (
      |  SELECT source AS grp, n_chars AS v, count(*) AS c
      |  FROM documents GROUP BY 1, 2),
      |pv AS (SELECT v, sum(c) AS c_all FROM cnt GROUP BY v),
      |pg AS (SELECT grp, sum(c) AS n_in FROM cnt GROUP BY grp),
      |tot AS (SELECT sum(c) AS n_tot FROM cnt),
      |spine AS (
      |  SELECT pg.grp, pv.v, pg.n_in, tot.n_tot - pg.n_in AS n_rest,
      |         coalesce(cnt.c, 0) AS c_in, pv.c_all
      |  FROM pv CROSS JOIN pg
      |  LEFT JOIN cnt ON cnt.grp = pg.grp AND cnt.v = pv.v
      |  CROSS JOIN tot),
      |cum AS (
      |  SELECT grp, n_in, n_rest,
      |         coalesce(lead(v) OVER (PARTITION BY grp ORDER BY v) - v,
      |                  0) AS gap,
      |         sum(c_in) OVER (PARTITION BY grp ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS cum_in,
      |         sum(c_all) OVER (PARTITION BY grp ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS cum_all
      |  FROM spine),
      |a AS (
      |  SELECT grp, max(n_in) AS n_in, max(n_rest) AS n_rest,
      |         CAST(sum(CAST(gap AS DECIMAL(9,0))
      |                     * CAST(abs(cum_in * n_rest
      |                                - (cum_all - cum_in) * n_in)
      |                            AS DECIMAL(28,0))) AS DOUBLE) AS w1_num
      |  FROM cum GROUP BY grp)
      |SELECT grp, CAST(n_in AS BIGINT) AS n_in,
      |       CAST(n_rest AS BIGINT) AS n_rest, w1_num,
      |       CASE WHEN n_in * n_rest = 0 THEN 0.0
      |            ELSE w1_num / CAST(n_in * n_rest AS DOUBLE) END AS w1_q
      |FROM a
      |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x141_wasserstein_drift" -> sourceLengthW1 _)

  val oracles: Map[String, String] = Map(
    "x141_wasserstein_drift" -> sourceLengthW1Sql)
}
