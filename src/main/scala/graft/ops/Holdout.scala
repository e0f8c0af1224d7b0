package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X128 — coordinated holdout across corpus snapshots (Broder-style
  * consistent sampling): the eval/holdout set must stay the SAME set
  * as the corpus updates — a resampled holdout silently leaks
  * yesterday's training docs into today's eval (the cross-version twin
  * of the X61 split-leakage audit, which checks one snapshot's split;
  * X128 checks the split's STABILITY across X77's snapshot evolution).
  *
  * The rule is membership by salted id hash alone:
  * holdout(d) ⇔ md5Long40(doc_id‖':holdout') mod 16 = 0 — no RNG, no
  * corpus statistics, so membership is a pure function of the id.
  * That purity IS the coordination guarantee, and the op PROVES it on
  * the data instead of assuming it: the audit full-outer-joins the two
  * snapshots' holdouts and emits `hold_flips` — docs present in both
  * snapshots whose membership changed — which must be exactly 0 (the
  * oracle computes the same count independently; a nonzero value means
  * someone salted the rule with snapshot state).
  *
  * Outputs ONE row: per-snapshot totals and holdout sizes, the overlap
  * decomposition (both / removed-with-A / added-with-B), and the flip
  * count. All exact i64 counts.
  *
  * Scale shape: membership is a row-local hash in the scan projection;
  * each snapshot aggregates holdout counts with map-side partials; the
  * audit joins only the HOLDOUT subsets (≈ n/16 rows each) co-keyed on
  * doc_id. The X77 snapshot derivation is the shared
  * [[SnapshotDiff.snapshotB]] seam (same CTEs on the oracle side).
  *
  * Reference scope: no split management in the reference; engine
  * extension (SURVEY §2.5, the X61/X66/X77 dataset-hygiene family).
  */
object Holdout {

  /** 1-in-Mod holdout rate. */
  val Mod = 16L

  def coordinatedHoldout(spark: SparkSession, dir: String): DataFrame =
    holdoutOf(Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text")))

  private def isHoldout(c: org.apache.spark.sql.Column) =
    md5Long40(concat(c.cast("string"), lit(":holdout"))) % Mod === 0

  /** Core of X128 over any (doc_id, source, text) frame; test seam. */
  private[graft] def holdoutOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val snapB = SnapshotDiff.snapshotB(docs)
    val hA = docs.filter(isHoldout($"doc_id")).select($"doc_id")
    val hB = snapB.filter(isHoldout($"doc_id")).select($"doc_id")
    val audit = hA.withColumn("in_a", lit(1L))
      .join(hB.withColumn("in_b", lit(1L)), Seq("doc_id"), "full_outer")
      .agg(
        sum(when($"in_a".isNotNull && $"in_b".isNotNull, 1L).otherwise(0L))
          .as("hold_both"),
        sum(when($"in_b".isNull, 1L).otherwise(0L)).as("hold_removed"),
        sum(when($"in_a".isNull, 1L).otherwise(0L)).as("hold_added"))
    // flips: docs present in BOTH snapshots whose membership differs —
    // must be zero because membership is a pure function of doc_id;
    // computed against the data, not assumed
    val flips = docs.select($"doc_id").withColumn("ha", isHoldout($"doc_id"))
      .join(snapB.select($"doc_id")
        .withColumn("hb", isHoldout($"doc_id")), Seq("doc_id"))
      .agg(sum(when($"ha" =!= $"hb", 1L).otherwise(0L)).as("hold_flips"))
    val nA = docs.agg(count(lit(1)).as("n_a"),
      sum(when(isHoldout($"doc_id"), 1L).otherwise(0L)).as("hold_a"))
    val nB = snapB.agg(count(lit(1)).as("n_b"),
      sum(when(isHoldout($"doc_id"), 1L).otherwise(0L)).as("hold_b"))
    nA.crossJoin(nB).crossJoin(audit).crossJoin(flips)
      .select($"n_a", $"n_b", $"hold_a", $"hold_b",
        $"hold_both", $"hold_removed", $"hold_added", $"hold_flips")
  }

  val coordinatedHoldoutSql: String = {
    val h = sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':holdout'")
    s"""WITH ${SnapshotDiff.snapBCtes},
       |ha AS (SELECT doc_id FROM documents WHERE $h % $Mod = 0),
       |hb AS (SELECT doc_id FROM snap_b WHERE $h % $Mod = 0),
       |audit AS (
       |  SELECT sum(CASE WHEN ha.doc_id IS NOT NULL
       |                   AND hb.doc_id IS NOT NULL THEN 1 ELSE 0 END)
       |           AS hold_both,
       |         sum(CASE WHEN hb.doc_id IS NULL THEN 1 ELSE 0 END)
       |           AS hold_removed,
       |         sum(CASE WHEN ha.doc_id IS NULL THEN 1 ELSE 0 END)
       |           AS hold_added
       |  FROM ha FULL OUTER JOIN hb ON ha.doc_id = hb.doc_id),
       |flips AS (
       |  SELECT sum(CASE WHEN (${sqlMd5Long40(
                        "CAST(d.doc_id AS VARCHAR) || ':holdout'")} % $Mod = 0)
       |                   <> (${sqlMd5Long40(
                        "CAST(b.doc_id AS VARCHAR) || ':holdout'")} % $Mod = 0)
       |             THEN 1 ELSE 0 END) AS hold_flips
       |  FROM documents d JOIN snap_b b ON d.doc_id = b.doc_id),
       |na AS (SELECT count(*) AS n_a,
       |              sum(CASE WHEN $h % $Mod = 0 THEN 1 ELSE 0 END)
       |                AS hold_a
       |       FROM documents),
       |nb AS (SELECT count(*) AS n_b,
       |              sum(CASE WHEN $h % $Mod = 0 THEN 1 ELSE 0 END)
       |                AS hold_b
       |       FROM snap_b)
       |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       |       CAST(hold_a AS BIGINT) AS hold_a,
       |       CAST(hold_b AS BIGINT) AS hold_b,
       |       CAST(hold_both AS BIGINT) AS hold_both,
       |       CAST(hold_removed AS BIGINT) AS hold_removed,
       |       CAST(hold_added AS BIGINT) AS hold_added,
       |       CAST(hold_flips AS BIGINT) AS hold_flips
       |FROM na CROSS JOIN nb CROSS JOIN audit CROSS JOIN flips""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x128_coordinated_holdout" -> coordinatedHoldout _)

  val oracles: Map[String, String] = Map(
    "x128_coordinated_holdout" -> coordinatedHoldoutSql)
}
