package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X117 — exact two-sample Kolmogorov–Smirnov drift statistic: for each
  * source, the KS distance between ITS document-length distribution and
  * the REST of the corpus — the whole-shape drift screen behind "did
  * this feed change?" (X53 compares binned marginals, X89 normalizes
  * quantiles, X115 tests categorical association; X117 is the
  * distribution-free test over a CONTINUOUS-ordered column, sensitive
  * anywhere the CDFs separate, not just at chosen bins/quantiles).
  *
  * Exactness — clear the denominators: the empirical CDFs step only at
  * observed values, so with cum_s(t) = #{source docs ≤ t} and
  * cum_r(t) = #{rest docs ≤ t} evaluated on the union value spine,
  *
  *   D = max_t |cum_s(t)/n_s − cum_r(t)/n_r|
  *     = max_t |cum_s(t)·n_r − cum_r(t)·n_s| / (n_s·n_r)
  *
  * — the op emits `d_num`/`d_den` as exact i64 (cums ≤ N, products
  * ≤ N² — safe to N ≈ 3·10⁹ docs) plus ONE IEEE division. The max over
  * the spine is exact (integer comparisons); identical distributions
  * give D = 0, disjoint supports give D = d_den exactly.
  *
  * Scale shape: one (source, value) count aggregate with map-side
  * partials; the union spine is (#sources × #distinct values) rows —
  * value-bounded, not corpus-bounded; cumulative sums are per-SOURCE
  * windows over that spine (never a global sort, never a window over
  * raw docs); one source-keyed max aggregate after. The per-value
  * corpus counts join the spine keyed on value. Nothing global but the
  * final ORDER BY over #sources rows.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X53/X89/X115 drift family).
  */
object KsDrift {

  def sourceLengthKs(spark: SparkSession, dir: String): DataFrame =
    ksOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("n_chars").as("v")))

  /** Core of X117 over any (grp, v:i64) frame; test seam. One row per
    * group: n_in, n_rest, exact KS fraction, float quotient.
    */
  private[graft] def ksOf(rows: DataFrame): DataFrame = {
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
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .withColumn("cum_in", sum($"c_in").over(w))
      .withColumn("cum_all", sum($"c_all").over(w))
      .groupBy($"grp")
      .agg(max($"n_in").as("n_in"), max($"n_rest").as("n_rest"),
        max(abs($"cum_in" * $"n_rest" -
          ($"cum_all" - $"cum_in") * $"n_in")).as("d_num"))
      .select($"grp", $"n_in", $"n_rest", $"d_num",
        ($"n_in" * $"n_rest").as("d_den"),
        when($"n_in" * $"n_rest" === 0, lit(0.0)).otherwise(
          $"d_num".cast("double") /
            ($"n_in" * $"n_rest").cast("double")).as("ks_q"))
      .orderBy($"grp")
  }

  val sourceLengthKsSql: String =
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
      |         sum(c_in) OVER (PARTITION BY grp ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS cum_in,
      |         sum(c_all) OVER (PARTITION BY grp ORDER BY v
      |           ROWS UNBOUNDED PRECEDING) AS cum_all
      |  FROM spine),
      |a AS (
      |  SELECT grp, max(n_in) AS n_in, max(n_rest) AS n_rest,
      |         max(abs(cum_in * n_rest - (cum_all - cum_in) * n_in))
      |           AS d_num
      |  FROM cum GROUP BY grp)
      |SELECT grp, CAST(n_in AS BIGINT) AS n_in,
      |       CAST(n_rest AS BIGINT) AS n_rest,
      |       CAST(d_num AS BIGINT) AS d_num,
      |       CAST(n_in * n_rest AS BIGINT) AS d_den,
      |       CASE WHEN n_in * n_rest = 0 THEN 0.0
      |            ELSE CAST(d_num AS DOUBLE)
      |                   / CAST(n_in * n_rest AS DOUBLE) END AS ks_q
      |FROM a
      |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x117_source_length_ks" -> sourceLengthKs _)

  val oracles: Map[String, String] = Map(
    "x117_source_length_ks" -> sourceLengthKsSql)
}
