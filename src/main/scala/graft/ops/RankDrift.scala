package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X170 — Mann–Whitney rank drift: per source, the Wilcoxon rank-sum /
  * Mann–Whitney U statistic of ITS document-length distribution against
  * the rest of the corpus (Mann & Whitney 1947) — the rank-based member
  * of the drift family, completing its vocabulary on the nonparametric
  * axis: X117's KS is the max CDF gap, X141's W₁ the transport
  * magnitude, X163 the banded log-ratio score, X170 the
  * stochastic-dominance probability P(X > Y) + ½·P(X = Y) — the AUC
  * reading "do this source's documents run longer than everyone
  * else's", robust to any monotone transform of length.
  *
  * Exactness — midranks without fractions: with values pre-aggregated
  * to distinct blocks (value x, in-count a, rest-count b, c = a + b,
  * `cum` = total count before the block), each block's midrank is
  * cum + (c+1)/2, so DOUBLING the rank sum clears the half:
  *
  *   2·R_in = Σ_blocks a·(2·cum + c + 1)      (exact i64)
  *   u2     = 2·U = 2·R_in − n_in·(n_in + 1)  (exact i64)
  *   auc    = u2 / (2·n_in·n_rest)            (ONE IEEE division)
  *
  * No z-score column by design: the tie-corrected variance needs a
  * three-product double chain — exactly the a·b − c·d FMA shape the
  * x158 lesson banned from cross-engine paths. Instead (round-14
  * verdict item 5, the x171 var18 discipline) the variance is emitted
  * CLEARED as an exact integer over the same value blocks:
  *
  *   var12_num = (n+1)·n·(n−1) − Σ_blocks (c³ − c)
  *   Var(U)    = n_in·n_rest · var12_num / (12·n·(n−1))
  *
  * The tie term runs over the COMBINED sample, so var12_num is one
  * corpus-level exact integer shared by every row; a consumer forms
  * z = (u2/2 − n_in·n_rest/2) / sqrt(Var(U)) without ever touching the
  * banned chain. The cubes run in exact DECIMAL (Spark) / HUGEINT
  * (DuckDB) and the emitted i64 is exact for n ≤ 2.09·10⁶ (n³ < 2⁶³ —
  * the RandIndex-style documented bound; beyond it Spark's decimal→long
  * cast nulls and DuckDB's HUGEINT→BIGINT cast errors: loud, not
  * silently wrapped). The DuckDB oracle recomputes the identical
  * blocks.
  *
  * Scale shape (the x109 mechanism plus X26's banding): ONE
  * map-side-combined aggregate to distinct (x) value blocks — the
  * length VALUE domain saturates, so everything downstream is
  * value-bounded, never corpus-bounded. The GLOBAL cumulative spine is
  * never a single-partition window (the lint-banned funnel): blocks
  * band row-locally by `x div W` (W a code constant — no driver
  * fetch), per-band totals join triangularly into broadcast band
  * offsets, and the within-band window is partitioned by band —
  * parallel at every stage even if the value domain grows large.
  * |sources| output rows.
  *
  * Reference scope: no drift analytics in the reference; engine
  * extension (SURVEY §2.5, the X117/X141/X163 drift family).
  */
object RankDrift {

  /** Band width over the value domain for the distributed prefix sum
    * (a code constant: bucketing needs no data-derived anchor because
    * x ≥ 0 and the domain saturates). */
  val BandW = 1024L

  def rankDrift(spark: SparkSession, dir: String): DataFrame =
    rankDriftOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("n_chars").as("x")))

  /** Core of X170 over any (grp, x:i64) frame; test seam. */
  private[graft] def rankDriftOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // global distinct-value blocks: total count + per-(grp, x) counts.
    // The corpus pass is ONE aggregate; everything after is
    // value-bounded.
    val cells = rows.groupBy($"grp", $"x").agg(count(lit(1)).as("a"))
    val blocks = cells.groupBy($"x").agg(sum($"a").as("c"))
      .withColumn("band", expr(s"x div $BandW"))
    // global cum over the value spine WITHOUT a single-partition
    // window: per-band totals → triangular band offsets (broadcast,
    // |values|/W rows) → within-band exclusive window keyed by band
    val bandTotals = blocks.groupBy($"band").agg(sum($"c").as("bc"))
    val bandOffsets = bandTotals.as("a")
      .join(broadcast(bandTotals.as("b")),
        col("b.band") < col("a.band"), "left")
      .groupBy(col("a.band").as("band"))
      .agg(coalesce(sum(col("b.bc")), lit(0L)).as("boff"))
    val byValInBand = Window.partitionBy($"band").orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val spine = blocks.join(broadcast(bandOffsets), Seq("band"))
      .withColumn("cum",
        $"boff" + coalesce(sum($"c").over(byValInBand), lit(0L)))
    val cDec = $"c".cast("decimal(20,0)")
    val total = blocks.agg(sum($"c").as("n"),
      sum(cDec * cDec * cDec - cDec).as("t3"))
    val nDec = $"n".cast("decimal(20,0)")
    cells.join(spine, Seq("x"))
      .groupBy($"grp")
      .agg(
        sum($"a").as("n_in"),
        sum($"a" * (lit(2L) * $"cum" + $"c" + lit(1L))).as("r2_in"))
      .crossJoin(broadcast(total))
      .select($"grp", $"n_in", ($"n" - $"n_in").as("n_rest"),
        ($"r2_in" - $"n_in" * ($"n_in" + lit(1L))).as("u2"),
        ((nDec + 1) * nDec * (nDec - 1) - $"t3").cast("long")
          .as("var12_num"))
      .withColumn("auc",
        when($"n_in" * $"n_rest" === 0, lit(0.5)).otherwise(
          $"u2".cast("double") /
            (lit(2.0) * ($"n_in" * $"n_rest").cast("double"))))
      .orderBy($"grp")
  }

  val rankDriftSql: String =
    """WITH cells AS (
      |  SELECT source AS grp, n_chars AS x, count(*) AS a
      |  FROM documents GROUP BY 1, 2),
      |spine AS (
      |  SELECT x, c,
      |         CAST(coalesce(sum(c) OVER (ORDER BY x
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |           AS BIGINT) AS cum
      |  FROM (SELECT x, CAST(sum(a) AS BIGINT) AS c
      |        FROM cells GROUP BY x)),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n,
      |               sum(CAST(c AS HUGEINT) * c * c - c) AS t3
      |        FROM spine),
      |agg AS (
      |  SELECT grp, CAST(sum(a) AS BIGINT) AS n_in,
      |         CAST(sum(a * (2 * cum + c + 1)) AS BIGINT) AS r2_in
      |  FROM cells JOIN spine USING (x)
      |  GROUP BY grp)
      |SELECT grp, n_in, n - n_in AS n_rest,
      |       r2_in - n_in * (n_in + 1) AS u2,
      |       CAST((CAST(n AS HUGEINT) + 1) * n * (n - 1) - t3 AS BIGINT)
      |         AS var12_num,
      |       CASE WHEN n_in * (n - n_in) = 0 THEN 0.5
      |            ELSE CAST(r2_in - n_in * (n_in + 1) AS DOUBLE)
      |                   / (2.0 * CAST(n_in * (n - n_in) AS DOUBLE)) END
      |         AS auc
      |FROM agg, tot
      |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x170_rank_drift" -> rankDrift _)

  val oracles: Map[String, String] = Map(
    "x170_rank_drift" -> rankDriftSql)
}
