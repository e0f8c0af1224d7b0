package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.{md5Long40, sqlMd5Long40}

/** X138 — KMV sketch ROLLUP: distinct-content cardinality at THREE
  * coarser grains (per source, per lang, global), every estimate
  * derived ONLY by merging the finest-grain (source, lang) sketches —
  * the re-aggregation property that makes sketches warehouse-native:
  * sketch the corpus ONCE at the finest grain you'll ever need, then
  * answer every coarser grain by the bottom-k union algebra
  * (k·|fine groups| rows) with NO second pass over the data. X134
  * builds one KMV per source; this op is the cube over it — the
  * sketch analog of B10's rollup, at sketch-state cost.
  *
  * Correctness rests on the bottom-k merge LAW (proved for samples in
  * X135, for pair queries in X137): bottom-k of a UNION of distinct
  * sets equals bottom-k of the union of the sets' bottom-k sketches —
  * hashes shared between fine groups (the same content in two langs)
  * dedup in the merge exactly as they would in the raw union. So the
  * merged estimate is BIT-IDENTICAL to the estimate a direct pass at
  * the coarse grain would produce — and the ORACLE PROVES THE LAW
  * cross-engine: the DuckDB side computes each grain DIRECTLY from the
  * data, the engine computes it from merged fine sketches, and the
  * driver hash-compares the two. K = 16 (not X134's 64) so the gated
  * corpus genuinely exercises the estimator above capacity at every
  * level; below capacity (union of fine sketches < K ⟹ every member
  * was complete ⟹ the union is the complete set) est = exact — the
  * family's losslessness convention, here a THEOREM of the merge.
  *
  * Estimate: X134's (K−1)·H/h₍K₎ (Bar-Yossef/Beyer) over the merged
  * Kth-smallest — an integer order statistic, one double division of
  * exact i64 operands. Everything hash-green.
  *
  * Scale shape: one (source, lang, h) distinct — the ONLY corpus-wide
  * pass; a per-fine-group rank cut to K rows (WindowGroupLimit
  * map-side); the rollup runs on ≤ 3·K·|fine| sketch rows. The
  * exact n_distinct audit per grain (X100 pattern) re-scans at each
  * grain and is what production drops — the sketch path IS the point.
  * Output is |sources| + |langs| + 1 rows.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, the B11/X45/X134–X137 sketch family).
  */
object SketchRollup {

  val K = 16
  /** Hash-space size of md5Long40. */
  val H = 1L << 40

  def sketchRollup(spark: SparkSession, dir: String): DataFrame =
    rollupOf(itemsOf(spark, dir))

  /** Fine-grain item universe: DISTINCT (source, lang, content-hash). */
  private[graft] def itemsOf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"source", $"lang", md5Long40($"text").as("h"))
      .distinct()
  }

  /** Bottom-K per (source, lang) — the once-built fine sketch table. */
  private[graft] def fineSketchOf(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    items
      .withColumn("rn", row_number().over(
        Window.partitionBy($"source", $"lang").orderBy($"h")))
      .filter($"rn" <= K)
      .select($"source", $"lang", $"h")
  }

  /** (level, key, h) stream at the three coarse grains from any
    * (source, lang, h) frame — shared by the merged path (fed the fine
    * sketches) and the exact audit (fed the full items).
    */
  private def leveled(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(lit("source").as("level"), $"source".as("key"), $"h")
      .unionByName(rows.select(lit("lang").as("level"),
        $"lang".as("key"), $"h"))
      .unionByName(rows.select(lit("all").as("level"),
        lit("all").as("key"), $"h"))
      .distinct()
  }

  /** KMV estimate per (level, key) from a (level, key, h) DISTINCT
    * stream: k_used, kth_hash, est_q — X134's formula.
    */
  private[graft] def kmvPerKey(stream: DataFrame): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    stream
      .withColumn("rn", row_number().over(
        Window.partitionBy($"level", $"key").orderBy($"h")).cast("long"))
      .filter($"rn" <= K)
      .groupBy($"level", $"key")
      .agg(count(lit(1)).as("k_used"), max($"h").as("kth_hash"))
      .withColumn("est_q",
        when($"k_used" < K, $"k_used".cast("double"))
          .otherwise((lit((K - 1).toDouble) * lit(H.toDouble)) /
            $"kth_hash".cast("double")))
  }

  /** Core of X138: merged-sketch estimates joined with the exact
    * per-grain audit (production drops the exact branch).
    */
  private[graft] def rollupOf(items: DataFrame): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    val est = kmvPerKey(leveled(fineSketchOf(items)))
    val exact = leveled(items)
      .groupBy($"level", $"key")
      .agg(count(lit(1)).as("n_distinct"))
    est.join(exact, Seq("level", "key"))
      .select($"level", $"key", $"n_distinct", $"k_used", $"kth_hash",
        $"est_q")
      .orderBy($"level", $"key")
  }

  val sketchRollupSql: String = {
    val h = sqlMd5Long40("text")
    s"""WITH items AS MATERIALIZED (
       |  SELECT DISTINCT source, lang, $h AS h FROM documents),
       |lv AS (
       |  SELECT DISTINCT level, key, h FROM (
       |    SELECT 'source' AS level, source AS key, h FROM items
       |    UNION ALL
       |    SELECT 'lang' AS level, lang AS key, h FROM items
       |    UNION ALL
       |    SELECT 'all' AS level, 'all' AS key, h FROM items)),
       |r AS (
       |  SELECT level, key, h,
       |         row_number() OVER (PARTITION BY level, key ORDER BY h)
       |           AS rn,
       |         count(*) OVER (PARTITION BY level, key) AS nd
       |  FROM lv)
       |SELECT level, key,
       |       CAST(max(nd) AS BIGINT) AS n_distinct,
       |       CAST(count(*) AS BIGINT) AS k_used,
       |       CAST(max(h) AS BIGINT) AS kth_hash,
       |       CASE WHEN count(*) < $K THEN CAST(count(*) AS DOUBLE)
       |            ELSE (CAST(${K - 1} AS DOUBLE) * CAST($H AS DOUBLE))
       |                   / CAST(max(h) AS DOUBLE) END AS est_q
       |FROM r WHERE rn <= $K
       |GROUP BY level, key
       |ORDER BY level, key""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x138_sketch_rollup" -> sketchRollup _)

  val oracles: Map[String, String] = Map(
    "x138_sketch_rollup" -> sketchRollupSql)
}
