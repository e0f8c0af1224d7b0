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
  * Exactness — the sorted-rank identity with ties handled by total
  * order: with per-source ranks i = 1…n over (n_chars asc, doc_id asc)
  * and x_i the i-th doc's length,
  *
  *   G = Σ (2i − n − 1)·x_i  /  (n · Σ x_i)
  *
  * Both sides are i64 sums (the rank tie-break by doc_id does not
  * change the value: within a tie group Σ(2i−n−1) weights a constant
  * x, and the weight sum over any contiguous rank block is
  * tie-order-invariant), so the op emits `gini_num`/`gini_den` exactly
  * plus ONE IEEE division (the b50/X99/X106 discipline). A one-doc or
  * zero-mass source yields den > 0 with num = 0 — exactly G = 0, no
  * special case.
  *
  * Scale shape: ranks are a per-SOURCE window (partitioned — the x89
  * shape, never a global sort) over the doc-count-bounded source
  * partition; one source-keyed aggregate after. At warehouse scale the
  * same query runs per (source, day) with the window partitioned by
  * both. Nothing global but the final ORDER BY.
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
    val w = Window.partitionBy($"grp").orderBy($"x", $"doc_id")
    rows
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n",
        count(lit(1)).over(Window.partitionBy($"grp")).cast("long"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_docs"), sum($"x").as("total"),
        sum((lit(2L) * $"i" - $"n" - lit(1L)) * $"x").as("gini_num"))
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
