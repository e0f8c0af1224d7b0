package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X115 — exact contingency / independence audit of the (lang, source)
  * composition: the full cross-table of observed vs independence-expected
  * document counts, with every deviation kept as an exact integer — the
  * composition-drift screen behind mixture planning (X46/X73 decide how
  * much of each source to take; X115 answers whether language mix is
  * INDEPENDENT of source, i.e. whether "balance sources" and "balance
  * languages" are one constraint or two; X53 measures drift of ONE
  * marginal, X115 measures association BETWEEN two).
  *
  * Exactness — clear the denominators: under independence the expected
  * cell count is E = r·c/N (rational), so the op emits the deviation
  *
  *   dev = O·N − r·c      (= N·(O − E), exact i64)
  *
  * per cell, plus the expected fraction as `exp_num = r·c`, `exp_den = N`
  * and the cell's χ² term (O−E)²/E = dev²/(N·r·c) as ONE double
  * expression over exact integer operands — `(dev·dev)/(r·c·N)` with both
  * engines multiplying in the same order over exactly-representable
  * inputs (each ≤ 2⁵³), so even the float column is bit-equal. Zero
  * cells of the full cross-product spine are REAL rows (O = 0 still
  * deviates by −r·c); dropping them would understate the statistic.
  *
  * Overflow bound: |dev| ≤ N·min(r,c) ≤ N² — i64-safe to N ≈ 3·10⁹ docs;
  * the χ² term squares dev in DOUBLE, never in i64. At warehouse scale
  * the same query runs per day-partition (N = a day's docs), which is
  * also the statistically meaningful unit of drift.
  *
  * Scale shape: one (lang, source) count aggregate with map-side
  * partials; marginals re-aggregate THOSE cell counts (never the corpus
  * twice); the cells join marginals and the one-row total by broadcast.
  * Nothing global but the final ORDER BY over #langs × #sources rows.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X7/X25/X53 composition family).
  */
object Contingency {

  def langSourceContingency(spark: SparkSession, dir: String): DataFrame =
    contingencyOf(Tables.documents(spark, dir)
      .select(col("lang").as("a"), col("source").as("b")))

  /** Core of X115 over any (a, b) categorical frame; test seam. */
  private[graft] def contingencyOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val cells = rows.groupBy($"a", $"b").agg(count(lit(1)).as("obs"))
    val ra = cells.groupBy($"a").agg(sum($"obs").as("r_tot"))
    val cb = cells.groupBy($"b").agg(sum($"obs").as("c_tot"))
    val tot = cells.agg(sum($"obs").as("n_tot"))
    val spine = ra.select($"a", $"r_tot")
      .crossJoin(broadcast(cb.select($"b", $"c_tot")))
    spine
      .join(cells, Seq("a", "b"), "left")
      .crossJoin(broadcast(tot))
      .select($"a", $"b",
        coalesce($"obs", lit(0L)).as("obs"),
        $"r_tot", $"c_tot", $"n_tot",
        ($"r_tot" * $"c_tot").as("exp_num"),
        $"n_tot".as("exp_den"),
        (coalesce($"obs", lit(0L)) * $"n_tot" - $"r_tot" * $"c_tot")
          .as("dev"))
      .withColumn("chi2_term",
        ($"dev".cast("double") * $"dev".cast("double")) /
          ($"r_tot".cast("double") * $"c_tot".cast("double") *
            $"n_tot".cast("double")))
      .orderBy($"a", $"b")
  }

  val langSourceContingencySql: String =
    """WITH cells AS (
      |  SELECT lang AS a, source AS b, count(*) AS obs
      |  FROM documents GROUP BY 1, 2),
      |ra AS (SELECT a, sum(obs) AS r_tot FROM cells GROUP BY a),
      |cb AS (SELECT b, sum(obs) AS c_tot FROM cells GROUP BY b),
      |tot AS (SELECT sum(obs) AS n_tot FROM cells)
      |SELECT ra.a, cb.b,
      |       CAST(coalesce(ce.obs, 0) AS BIGINT) AS obs,
      |       CAST(ra.r_tot AS BIGINT) AS r_tot,
      |       CAST(cb.c_tot AS BIGINT) AS c_tot,
      |       CAST(tot.n_tot AS BIGINT) AS n_tot,
      |       CAST(ra.r_tot * cb.c_tot AS BIGINT) AS exp_num,
      |       CAST(tot.n_tot AS BIGINT) AS exp_den,
      |       CAST(coalesce(ce.obs, 0) * tot.n_tot
      |              - ra.r_tot * cb.c_tot AS BIGINT) AS dev,
      |       (CAST(coalesce(ce.obs, 0) * tot.n_tot
      |               - ra.r_tot * cb.c_tot AS DOUBLE)
      |          * CAST(coalesce(ce.obs, 0) * tot.n_tot
      |               - ra.r_tot * cb.c_tot AS DOUBLE))
      |         / (CAST(ra.r_tot AS DOUBLE) * CAST(cb.c_tot AS DOUBLE)
      |              * CAST(tot.n_tot AS DOUBLE)) AS chi2_term
      |FROM ra CROSS JOIN cb
      |LEFT JOIN cells ce ON ce.a = ra.a AND ce.b = cb.b
      |CROSS JOIN tot
      |ORDER BY ra.a, cb.b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x115_lang_source_contingency" -> langSourceContingency _)

  val oracles: Map[String, String] = Map(
    "x115_lang_source_contingency" -> langSourceContingencySql)
}
