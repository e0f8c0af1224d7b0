package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X109 — exact Gini coefficient of document length per source: how
  * unequally a source's token mass is distributed over its documents —
  * the concentration audit behind mixture weighting (a source whose
  * mass sits in a few giant docs contributes far less DIVERSITY than
  * its token count suggests, and dedup/packing behave differently on
  * it; X49/X89 score doc quality, X107 vocabulary breadth — X109
  * measures mass concentration). Gini = 0 all-equal, → 1 one doc
  * holds everything.
  *
  * Exactness — the sorted-rank identity computed in CLOSED FORM per
  * tie block: with per-source ranks i = 1…n over (x asc, doc_id asc)
  * and x_i the i-th doc's length, G = Σ (2i − n − 1)·x_i / (n·Σ x_i).
  * Within a tie block (same x, count c, cum_before docs at smaller
  * values) the weight sum telescopes exactly:
  *
  *   Σ_{i=cum_before+1}^{cum_before+c} (2i − n − 1) = c·(2·cum_before + c − n)
  *
  * so gini_num = Σ_blocks x·c·(2·cum_before + c − n) — the same i64 the
  * per-doc rank form produces (the tie-break by doc_id never mattered:
  * weights within a block multiply a constant x). The op emits
  * `gini_num`/`gini_den` exactly plus ONE IEEE division (the
  * b50/X99/X106 discipline); the DuckDB oracle keeps the per-doc
  * row_number form, so the hash gate IS the cross-engine proof of the
  * block identity. A one-doc or zero-mass source yields den > 0 with
  * num = 0 — exactly G = 0, no special case.
  *
  * Scale shape (round-13 verdict item 3): the corpus pass is ONE
  * map-side-combined aggregate to distinct (source, x) value blocks —
  * length values are heavily duplicated and the VALUE domain saturates
  * (n_chars is bounded), so the cumulative-count window runs over
  * value-bounded rows, never corpus-bounded ones. The previous shape —
  * per-source row_number over one row per DOCUMENT — was a fixed
  * |sources|-way parallelism funnel: corpus/|sources| rows sorted in a
  * single task at 100 TB. Now nothing downstream of the first
  * aggregate scales with the corpus. At warehouse scale the same query
  * runs per (source, day) with both keys in the window partition.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X7/X25/X89/X107 profile family).
  */
object Gini {

  def sourceGini(spark: SparkSession, dir: String): DataFrame =
    giniOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("doc_id"),
        col("n_chars").as("x")))

  /** Core of X109 over any (grp, doc_id, x:i64 ≥ 0) frame; test seam. */
  private[graft] def giniOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // corpus → distinct-value blocks: the ONLY corpus-sized pass, and
    // it is a map-side-combined aggregate, not a window
    val blocks = rows.groupBy($"grp", $"x").agg(count(lit(1)).as("c"))
    // cumulative doc count over distinct VALUES per source (exclusive),
    // and the per-source total — both windows over value-bounded rows
    val byVal = Window.partitionBy($"grp").orderBy($"x")
      .rowsBetween(Window.unboundedPreceding, -1)
    blocks
      .withColumn("cum_before", coalesce(sum($"c").over(byVal), lit(0L)))
      .withColumn("n",
        sum($"c").over(Window.partitionBy($"grp")).cast("long"))
      .groupBy($"grp")
      .agg(sum($"c").as("n_docs"), sum($"x" * $"c").as("total"),
        sum($"x" * $"c" * (lit(2L) * $"cum_before" + $"c" - $"n"))
          .as("gini_num"))
      .select($"grp", $"n_docs", $"total",
        $"gini_num", ($"n_docs" * $"total").as("gini_den"),
        when($"total" === 0, lit(0.0)).otherwise(
          $"gini_num".cast("double") /
            ($"n_docs" * $"total").cast("double")).as("gini_q"))
      .orderBy($"grp")
  }

  val sourceGiniSql: String =
    """WITH r AS (
      |  SELECT source AS grp, n_chars AS x,
      |         row_number() OVER (PARTITION BY source
      |           ORDER BY n_chars, doc_id) AS i,
      |         count(*) OVER (PARTITION BY source) AS n
      |  FROM documents),
      |a AS (
      |  SELECT grp, count(*) AS n_docs, sum(x) AS total,
      |         sum((2 * i - n - 1) * x) AS gini_num
      |  FROM r GROUP BY grp)
      |SELECT grp, CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(total AS BIGINT) AS total,
      |       CAST(gini_num AS BIGINT) AS gini_num,
      |       CAST(n_docs * total AS BIGINT) AS gini_den,
      |       CASE WHEN total = 0 THEN 0.0
      |            ELSE CAST(gini_num AS DOUBLE)
      |                   / CAST(n_docs * total AS DOUBLE) END AS gini_q
      |FROM a
      |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x109_source_gini" -> sourceGini _)

  val oracles: Map[String, String] = Map(
    "x109_source_gini" -> sourceGiniSql)
}
