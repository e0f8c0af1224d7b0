package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.{md5Long40, sqlMd5Long40}

/** X135 — mergeable hash-sample quantile sketch per source, the
  * quantile analog of X134's KMV cardinality sketch and, like it,
  * ORACLE-CHECKABLE: the sketch state is "the K rows with the smallest
  * portable row hashes" — a pure deterministic function of the data —
  * so the approximate estimates themselves hash-match across engines,
  * unlike t-digest/KLL whose states are implementation-defined (the
  * reason B39/X34 are exact and Spark's percentile_approx is absent
  * from the gated surface). The estimate for quantile q is the exact
  * LOWER order statistic (the X126/B51 integer-selection stance) of
  * the sample: idx = ⌈q·k⌉ computed as (k·q% + 99) div 100 — integer
  * floor-division both engines agree on.
  *
  * Why bottom-k-by-hash is the right 100 TB sampler: the sample is a
  * uniform random subset (the hash is salted on doc_id, independent of
  * the value), it is MERGEABLE by the same order-statistic algebra as
  * KMV (union of two bottom-k sets → the k smallest of the union — an
  * associative partial aggregate, so shards/partitions/days combine
  * without resampling), and its state is K rows per group at ANY
  * corpus size where the exact path (B39/X34) shuffles every row to a
  * sort. Below capacity (group ≤ K rows) the sample IS the group and
  * est = exact by construction — the X134 losslessness convention.
  * The registered query carries the exact order statistics alongside
  * (the X100 audit pattern: estimate and ground truth in one row);
  * the production deployment drops the exact columns — the [[sampleOf]]
  * seam is the sketch alone.
  *
  * Scale shape: sample selection is a per-GROUP rank-window cut
  * (WindowGroupLimit pushes rank ≤ K map-side — the B15/X29/X74
  * discipline; at warehouse scale the same cut is B56's bounded TopK
  * aggregate with (h, id) order), then all quantile work happens on
  * ≤ K·|groups| rows. Output is |groups| rows.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, the B11/X45/X134 sketch family).
  */
object QuantileSketch {

  val K = 64
  /** Estimated quantiles, in percent (integer — exact index math). */
  val Qs = Seq(25, 50, 90)

  def quantileSketch(spark: SparkSession, dir: String): DataFrame =
    sketchOf(Tables.documents(spark, dir).select(
      col("source").as("grp"), col("doc_id").as("id"),
      col("n_chars").as("v")))

  /** The sketch state: per group, the K rows with the smallest salted
    * row hashes (deterministic; mergeable by bottom-k union). Seam for
    * the merge-law spec and the production no-audit form.
    */
  private[graft] def sampleOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .withColumn("h",
        md5Long40(concat($"id".cast("string"), lit(":qs"))))
      .withColumn("srn", row_number().over(
        Window.partitionBy($"grp").orderBy($"h", $"id")))
      .filter($"srn" <= K)
      .select($"grp", $"id", $"v")
  }

  /** Lower order statistics of `v` per group: one row per group with
    * n and the value at rank ⌈q·n⌉ for each q.
    */
  private[graft] def orderStatsOf(rows: DataFrame,
      prefix: String): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    // index math: (n*q + 99) div 100 = ⌈q%·n⌉ — Spark's `/` on longs
    // is double division, so the explicit integer `div` via expr
    val idxed = rows
      .withColumn("vr", row_number().over(
        Window.partitionBy($"grp").orderBy($"v", $"id")).cast("long"))
      .withColumn("n", count(lit(1)).over(
        Window.partitionBy($"grp")).cast("long"))
    val aggCols = max($"n").as(s"${prefix}n") +:
      Qs.map(q => max(when(
        $"vr" === expr(s"(n * $q + 99) div 100"),
        $"v")).as(s"${prefix}p$q"))
    idxed.groupBy($"grp").agg(aggCols.head, aggCols.tail: _*)
  }

  /** Core of X135 over any (grp, id, v) frame; v integer-valued. */
  private[graft] def sketchOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val est = orderStatsOf(sampleOf(rows), "est_")
    val exact = orderStatsOf(rows, "exact_")
    exact.join(est, Seq("grp"))
      .select(Seq($"grp", $"exact_n".as("n_rows"),
        $"est_n".as("k_used")) ++
        Qs.map(q => col(s"est_p$q")) ++
        Qs.map(q => col(s"exact_p$q")): _*)
      .orderBy($"grp")
  }

  val quantileSketchSql: String = {
    val h = sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':qs'")
    def stats(src: String, prefix: String): String =
      s"""SELECT grp, max(n) AS ${prefix}n,
         |       ${Qs.map(q =>
              s"max(CASE WHEN vr = (n * $q + 99) // 100 THEN v END) " +
                s"AS ${prefix}p$q").mkString(",\n       ")}
         |FROM (SELECT grp, v,
         |        row_number() OVER (PARTITION BY grp ORDER BY v, id)
         |          AS vr,
         |        count(*) OVER (PARTITION BY grp) AS n
         |      FROM $src)
         |GROUP BY grp""".stripMargin
    s"""WITH rows0 AS (
       |  SELECT source AS grp, doc_id AS id, n_chars AS v,
       |         $h AS h
       |  FROM documents),
       |sample AS (
       |  SELECT grp, id, v FROM (
       |    SELECT grp, id, v,
       |           row_number() OVER (PARTITION BY grp ORDER BY h, id)
       |             AS srn
       |    FROM rows0)
       |  WHERE srn <= $K),
       |est AS (${stats("sample", "est_")}),
       |exact AS (${stats("rows0", "exact_")})
       |SELECT exact.grp,
       |       CAST(exact_n AS BIGINT) AS n_rows,
       |       CAST(est_n AS BIGINT) AS k_used,
       |       ${Qs.map(q => s"CAST(est_p$q AS BIGINT) AS est_p$q")
            .mkString(", ")},
       |       ${Qs.map(q => s"CAST(exact_p$q AS BIGINT) AS exact_p$q")
            .mkString(", ")}
       |FROM exact JOIN est ON exact.grp = est.grp
       |ORDER BY exact.grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x135_quantile_sketch" -> quantileSketch _)

  val oracles: Map[String, String] = Map(
    "x135_quantile_sketch" -> quantileSketchSql)
}
