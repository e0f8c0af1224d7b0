package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.KmvSketch
import graft.functions.Hashing.{md5Long40, sqlMd5Long40}

/** X148 — sketch-estimated cross-snapshot novelty: per source, how much
  * distinct content is NEW today vs yesterday (and how much was
  * removed), estimated from two bottom-K sketches ALONE — the
  * freshness-monitoring question a daily ingestion pipeline asks of
  * every feed, answered without ever joining the two snapshots.
  * Composes X77's deterministic snapshot-B seam with the KMV family's
  * set algebra: est|new| = est|A∪B| − est|B|, where the union sketch is
  * the bottom-K merge of the two stored sketches (the X135/X138 union
  * law — K smallest of bottomK(A) ∪ bottomK(B) = K smallest of A∪B),
  * so yesterday's sketch is all that must be RETAINED: K longs per
  * source buys every later novelty question against any newer snapshot.
  *
  * Exactness: sketches are [[graft.functions.KmvSketch]] bounded
  * aggregates over raw content hashes (dedup internal); the union
  * merge is array_union + sort + take-K — integers end to end; each
  * estimate follows X134's convention from the sketch alone (k < K ⇒
  * the sketch IS the set, est exact; else (K−1)·2⁴⁰/h₍K₎), and the
  * novelty deltas est_union − est_b / est_union − est_a are
  * subtractions of identically-computed doubles clamped at 0 — all
  * hash-green. Exact anti-join audits ride alongside (X100 pattern;
  * the audit is the two-snapshot join the sketch path avoids).
  *
  * Scale shape: each snapshot is touched once by a source-keyed
  * bounded aggregate (≤K longs per (source, partition) on the wire);
  * everything after is |sources|-row array math. The exact audit joins
  * the two distinct-hash streams — the one corpus-sized join a
  * deployment drops.
  *
  * Reference scope: no snapshots in the reference; engine extension
  * (SURVEY §2.5, the X77/X128 snapshot family meeting the X134–X139
  * sketch family).
  */
object SketchNovelty {

  val K = Kmv.K
  /** Hash-space size of md5Long40. */
  val H = 1L << 40

  def sketchNovelty(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    noveltyOf(docs, SnapshotDiff.snapshotB(docs))
  }

  /** Core of X148 over two (doc_id, source, text) snapshots. */
  private[graft] def noveltyOf(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    import spark.implicits._
    val kmv = udaf(new KmvSketch(K))
    def hashesOf(df: DataFrame) =
      df.select($"source".as("grp"), md5Long40($"text").as("h"))
    def sketchOf(df: DataFrame, pre: String) =
      hashesOf(df).groupBy($"grp").agg(
        countDistinct($"h").as(s"n_$pre"), kmv($"h").as(s"ks_$pre"))
    def estOf(k: org.apache.spark.sql.Column,
        kth: org.apache.spark.sql.Column) =
      when(k < K, k.cast("double"))
        .otherwise((lit((K - 1).toDouble) * lit(H.toDouble)) /
          kth.cast("double"))
    val ha = hashesOf(a).distinct()
    val hb = hashesOf(b).distinct()
    val newCnt = ha.join(hb, Seq("grp", "h"), "left_anti")
      .groupBy($"grp").agg(count(lit(1)).as("exact_new"))
    val remCnt = hb.join(ha, Seq("grp", "h"), "left_anti")
      .groupBy($"grp").agg(count(lit(1)).as("exact_removed"))
    sketchOf(a, "a")
      .join(sketchOf(b, "b"), Seq("grp"), "full_outer")
      .join(newCnt, Seq("grp"), "left")
      .join(remCnt, Seq("grp"), "left")
      // a source present in only ONE snapshot carries a null sketch out
      // of the full_outer join; coalesce to the EMPTY sketch before any
      // size/est math — size(null) is null under ANSI, so est_a/est_b
      // would go null and greatest(null, 0.0) would report est_new =
      // 0.0 for a brand-new feed, the opposite of the truth (round-12
      // advice). An empty sketch estimates 0.0 (k = 0 < K ⇒ exact).
      .withColumn("ks_a", coalesce($"ks_a", typedLit(Seq.empty[Long])))
      .withColumn("ks_b", coalesce($"ks_b", typedLit(Seq.empty[Long])))
      // union sketch from the two stored sketches ALONE: bottom-K of
      // the deduped merge (the X138 law; arrays are already sorted)
      .withColumn("ks_u",
        slice(array_sort(array_union($"ks_a", $"ks_b")), 1, K))
      .select($"grp",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"),
        coalesce($"exact_new", lit(0L)).as("exact_new"),
        coalesce($"exact_removed", lit(0L)).as("exact_removed"),
        size($"ks_a").cast("long").as("k_a"),
        size($"ks_b").cast("long").as("k_b"),
        size($"ks_u").cast("long").as("k_u"),
        estOf(size($"ks_a").cast("long"),
          element_at($"ks_a", size($"ks_a"))).as("est_a"),
        estOf(size($"ks_b").cast("long"),
          element_at($"ks_b", size($"ks_b"))).as("est_b"),
        estOf(size($"ks_u").cast("long"),
          element_at($"ks_u", size($"ks_u"))).as("est_u"))
      .withColumn("est_new", greatest($"est_u" - $"est_b", lit(0.0)))
      .withColumn("est_removed", greatest($"est_u" - $"est_a", lit(0.0)))
      .orderBy($"grp")
  }

  val sketchNoveltySql: String = {
    val h = sqlMd5Long40("text")
    def side(src: String, s: String) =
      s"""h$s AS (SELECT DISTINCT source AS grp, $h AS h FROM $src),
         |r$s AS (
         |  SELECT grp, h,
         |         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn,
         |         count(*) OVER (PARTITION BY grp) AS nd
         |  FROM h$s),
         |s$s AS (
         |  SELECT grp, CAST(max(nd) AS BIGINT) AS n_$s,
         |         CAST(count(*) AS BIGINT) AS k_$s,
         |         CAST(max(h) AS BIGINT) AS kth_$s
         |  FROM r$s WHERE rn <= $K GROUP BY grp)""".stripMargin
    def est(k: String, kth: String) =
      s"""CASE WHEN $k < $K THEN CAST($k AS DOUBLE)
         |ELSE (CAST(${K - 1} AS DOUBLE) * CAST($H AS DOUBLE))
         |  / CAST($kth AS DOUBLE) END""".stripMargin.replace("\n", " ")
    s"""WITH ${SnapshotDiff.snapBCtes},
       |${side("documents", "a")},
       |${side("snap_b", "b")},
       |us AS (
       |  SELECT grp, h FROM ra WHERE rn <= $K
       |  UNION
       |  SELECT grp, h FROM rb WHERE rn <= $K),
       |ru AS (
       |  SELECT grp, h,
       |         row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
       |  FROM us),
       |su AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS k_u,
       |         CAST(max(h) AS BIGINT) AS kth_u
       |  FROM ru WHERE rn <= $K GROUP BY grp),
       |xn AS (
       |  SELECT a.grp, CAST(count(*) AS BIGINT) AS exact_new
       |  FROM ha a LEFT JOIN hb b ON a.grp = b.grp AND a.h = b.h
       |  WHERE b.h IS NULL GROUP BY a.grp),
       |xr AS (
       |  SELECT b.grp, CAST(count(*) AS BIGINT) AS exact_removed
       |  FROM hb b LEFT JOIN ha a ON a.grp = b.grp AND a.h = b.h
       |  WHERE a.h IS NULL GROUP BY b.grp),
       |est0 AS (
       |  -- su covers every source present in EITHER snapshot (it is
       |  -- built from the union stream), so driving from su with LEFT
       |  -- joins keeps single-snapshot sources; a missing side's k
       |  -- coalesces to 0 (< K ⇒ est 0.0 — the Scala empty-sketch
       |  -- convention; its kth branch is then never taken)
       |  SELECT su.grp,
       |         coalesce(sa.n_a, 0) AS n_a, coalesce(sb.n_b, 0) AS n_b,
       |         coalesce(xn.exact_new, 0) AS exact_new,
       |         coalesce(xr.exact_removed, 0) AS exact_removed,
       |         coalesce(sa.k_a, 0) AS k_a, coalesce(sb.k_b, 0) AS k_b,
       |         su.k_u,
       |         ${est("coalesce(sa.k_a, 0)", "sa.kth_a")} AS est_a,
       |         ${est("coalesce(sb.k_b, 0)", "sb.kth_b")} AS est_b,
       |         ${est("su.k_u", "su.kth_u")} AS est_u
       |  FROM su
       |  LEFT JOIN sa ON su.grp = sa.grp
       |  LEFT JOIN sb ON su.grp = sb.grp
       |  LEFT JOIN xn ON su.grp = xn.grp
       |  LEFT JOIN xr ON su.grp = xr.grp)
       |SELECT grp, n_a, n_b, exact_new, exact_removed, k_a, k_b, k_u,
       |       est_a, est_b, est_u,
       |       greatest(est_u - est_b, 0.0) AS est_new,
       |       greatest(est_u - est_a, 0.0) AS est_removed
       |FROM est0
       |ORDER BY grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x148_sketch_novelty" -> sketchNovelty _)

  val oracles: Map[String, String] = Map(
    "x148_sketch_novelty" -> sketchNoveltySql)
}
