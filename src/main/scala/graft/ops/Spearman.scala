package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X116 — grouped Spearman rank correlation, exact through the rank
  * stage: per source, the monotone association between document length
  * (n_chars) and lexical breadth (distinct words) — the redundancy
  * screen behind length-based quality heuristics (X10 thresholds on
  * length; X116 answers whether length is even a PROXY for breadth in
  * this source, or the source pads length without adding vocabulary —
  * boilerplate and template sources decouple the two). X76 correlates
  * exact numeric values; ranks are the robust form a heavy-tailed
  * length distribution needs.
  *
  * Exactness — double the average ranks so ties stay integral (the
  * X106 2U discipline): with c ties sharing min-rank r, the average
  * rank is r + (c−1)/2, so u = 2r + c − 1 is an exact i64; Spearman is
  * Pearson over (u, v), whose three sufficient statistics
  *
  *   num = n·Σuv − Σu·Σv,  sxx = n·Σu² − (Σu)²,  syy = n·Σv² − (Σv)²
  *
  * are exact i64 sums (no Σd² shortcut — it is WRONG under ties). The
  * op emits all three plus ρ = num / √(sxx·syy) as ONE double
  * expression over exact integer operands — the product taken in
  * DOUBLE (can't overflow, one correctly-rounded multiply) so a
  * perfect monotone group yields exactly ±1 (√(s²) = s is exact;
  * √s·√s is not): i64→double casts round identically, IEEE sqrt and
  * multiply are correctly rounded, and both engines evaluate the same
  * expression tree — bit-equal. A constant column
  * (sxx or syy = 0) defines ρ = 0. Overflow: n·Σu² ≤ 4n⁴ — i64-safe to
  * n ≈ 6.9·10⁴ docs per group; larger groups re-key per (source, day),
  * the statistically meaningful drift unit.
  *
  * Scale shape: the per-doc breadth is one (doc_id, word) distinct
  * aggregate with map-side partials (vocab-bounded per doc, never a
  * collect); ranks are per-SOURCE windows (partitioned — never a
  * global sort) plus a (source, value) tie-count window on the same
  * exchange; one source-keyed aggregate after. Nothing global but the
  * final ORDER BY over #sources rows.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X76/X99/X106 statistics family).
  */
object Spearman {

  def lengthBreadthSpearman(spark: SparkSession, dir: String): DataFrame =
    lengthBreadthOf(Tables.documents(spark, dir), col("n_chars"))

  /** The (grp, x, y) metric build over any documents frame — `x` is
    * the length column (n_chars for the registered query; ScaleBench's
    * replica carries no n_chars and passes length(text)).
    */
  private[graft] def lengthBreadthOf(docs: DataFrame,
      x: org.apache.spark.sql.Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val breadth = docs
      .select($"doc_id", explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .groupBy($"doc_id")
      .agg(countDistinct($"word").as("y"))
    val metric = docs
      .select($"source".as("grp"), $"doc_id", x.cast("long").as("x"))
      .join(breadth, Seq("doc_id"), "left")
      .select($"grp", $"doc_id", $"x", coalesce($"y", lit(0L)).as("y"))
    spearmanOf(metric)
  }

  /** Core of X116 over any (grp, doc_id, x:i64, y:i64) frame; test seam. */
  private[graft] def spearmanOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val u = lit(2L) * rank().over(
        Window.partitionBy($"grp").orderBy($"x")).cast("long") +
      count(lit(1)).over(Window.partitionBy($"grp", $"x")).cast("long") -
      lit(1L)
    val v = lit(2L) * rank().over(
        Window.partitionBy($"grp").orderBy($"y")).cast("long") +
      count(lit(1)).over(Window.partitionBy($"grp", $"y")).cast("long") -
      lit(1L)
    rows
      .withColumn("u", u).withColumn("v", v)
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_docs"),
        (count(lit(1)) * sum($"u" * $"v") - sum($"u") * sum($"v"))
          .as("rho_num"),
        (count(lit(1)) * sum($"u" * $"u") - sum($"u") * sum($"u"))
          .as("sxx"),
        (count(lit(1)) * sum($"v" * $"v") - sum($"v") * sum($"v"))
          .as("syy"))
      .withColumn("rho",
        when($"sxx" > 0 && $"syy" > 0,
          $"rho_num".cast("double") /
            sqrt($"sxx".cast("double") * $"syy".cast("double")))
          .otherwise(lit(0.0)))
      .orderBy($"grp")
  }

  val lengthBreadthSpearmanSql: String =
    """WITH breadth AS (
      |  SELECT doc_id, count(DISTINCT word) AS y
      |  FROM (SELECT doc_id,
      |               unnest(string_split_regex(lower(text), '\s+')) AS word
      |        FROM documents)
      |  WHERE word <> ''
      |  GROUP BY doc_id),
      |m AS (
      |  SELECT d.source AS grp, d.doc_id, d.n_chars AS x,
      |         coalesce(b.y, 0) AS y
      |  FROM documents d LEFT JOIN breadth b ON d.doc_id = b.doc_id),
      |r AS (
      |  SELECT grp,
      |         2 * rank() OVER (PARTITION BY grp ORDER BY x)
      |           + count(*) OVER (PARTITION BY grp, x) - 1 AS u,
      |         2 * rank() OVER (PARTITION BY grp ORDER BY y)
      |           + count(*) OVER (PARTITION BY grp, y) - 1 AS v
      |  FROM m),
      |a AS (
      |  SELECT grp, count(*) AS n_docs,
      |         count(*) * sum(u * v) - sum(u) * sum(v) AS rho_num,
      |         count(*) * sum(u * u) - sum(u) * sum(u) AS sxx,
      |         count(*) * sum(v * v) - sum(v) * sum(v) AS syy
      |  FROM r GROUP BY grp)
      |SELECT grp, CAST(n_docs AS BIGINT) AS n_docs,
      |       CAST(rho_num AS BIGINT) AS rho_num,
      |       CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
      |       CASE WHEN sxx > 0 AND syy > 0
      |            THEN CAST(rho_num AS DOUBLE)
      |                   / sqrt(CAST(sxx AS DOUBLE)
      |                            * CAST(syy AS DOUBLE))
      |            ELSE 0.0 END AS rho
      |FROM a
      |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x116_length_breadth_spearman" -> lengthBreadthSpearman _)

  val oracles: Map[String, String] = Map(
    "x116_length_breadth_spearman" -> lengthBreadthSpearmanSql)
}
