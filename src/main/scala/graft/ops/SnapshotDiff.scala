package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.{md5Long40, sqlMd5Long40}

/** X77 — corpus snapshot diff: classify every document across two crawl
  * snapshots as added / removed / changed / unchanged by doc_id +
  * content hash, rolled up per source — the between-crawls audit every
  * recurring ingestion runs before deciding what to re-process (changed
  * + added feed the pipeline; removed feeds tombstoning; unchanged
  * skips — the incremental-compute contract).
  *
  * Snapshot B derives from the same table by DETERMINISTIC hash rules
  * (the x61 in-query fixture pattern — both engines construct the
  * identical snapshot): ~5% of docs dropped (removed), ~10% get a
  * content revision (changed), ~4% fresh ids appended (added).
  *
  * Scale shape: the diff is ONE doc_id-keyed full outer join — both
  * sides co-partition on the join key, no broadcast needed (snapshots
  * scale together); content comparison is a row-local md5 on each side
  * (computed in the scan projection, never a second pass), and the
  * rollup is a two-phase (source, class) aggregate. At 100 TB this is
  * the shape a lakehouse diff runs: sorted-merge on the id, constant
  * memory per task.
  *
  * Parity: classes come from null-ness and exact string equality of
  * md5 hex (engine-identical); counts are i64 (DuckDB sums cast).
  */
object SnapshotDiff {

  def snapshotDiff(spark: SparkSession, dir: String): DataFrame =
    snapshotDiffOf(Tables.documents(spark, dir))

  /** The simulated second snapshot: drop ~5%, revise ~10% of the
    * survivors, append ~4% under fresh ids — all decided by salted
    * doc_id hashes. Shared by X77's diff and X128's coordinated-
    * holdout audit (same snapshot, same SQL CTE on the oracle side).
    */
  private[graft] def snapshotB(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kept = docs
      .filter(md5Long40(concat($"doc_id".cast("string"), lit(":rm"))) % 20 =!= 0)
      .select($"doc_id", $"source",
        when(md5Long40(concat($"doc_id".cast("string"), lit(":chg"))) % 10 === 0,
          concat($"text", lit(" [rev2]"))).otherwise($"text").as("text"))
    val added = docs
      .filter(md5Long40(concat($"doc_id".cast("string"), lit(":add"))) % 25 === 0)
      .select(($"doc_id" + 1000000000L).as("doc_id"), $"source", $"text")
    kept.unionAll(added)
  }

  /** X77 over any (doc_id, source, text) frame — ScaleBench seam. */
  private[graft] def snapshotDiffOf(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val docs = documents.select($"doc_id", $"source", $"text")
    val snapB = snapshotB(docs)

    val a = docs.select($"doc_id", $"source".as("src_a"), md5($"text").as("h_a"))
    val b = snapB.select($"doc_id", $"source".as("src_b"), md5($"text").as("h_b"))
    a.join(b, Seq("doc_id"), "full_outer")
      .select(coalesce($"src_a", $"src_b").as("source"),
        when($"h_a".isNull, "added")
          .when($"h_b".isNull, "removed")
          .when($"h_a" =!= $"h_b", "changed")
          .otherwise("unchanged").as("change_class"))
      .groupBy($"source", $"change_class")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"source", $"change_class")
  }

  /** SQL CTE chain producing `snap_b` — the oracle twin of
    * [[snapshotB]], shared with X128.
    */
  private[graft] val snapBCtes: String = {
    val hRm = sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':rm'")
    val hChg = sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':chg'")
    val hAdd = sqlMd5Long40("CAST(doc_id AS VARCHAR) || ':add'")
    s"""kept AS (
       |  SELECT doc_id, source,
       |         CASE WHEN $hChg % 10 = 0 THEN text || ' [rev2]'
       |              ELSE text END AS text
       |  FROM documents
       |  WHERE $hRm % 20 <> 0),
       |added AS (
       |  SELECT doc_id + 1000000000 AS doc_id, source, text
       |  FROM documents
       |  WHERE $hAdd % 25 = 0),
       |snap_b AS (SELECT * FROM kept UNION ALL SELECT * FROM added)""".stripMargin
  }

  val snapshotDiffSql: String = {
    s"""WITH $snapBCtes,
       |a AS (SELECT doc_id, source AS src_a, md5(text) AS h_a FROM documents),
       |b AS (SELECT doc_id, source AS src_b, md5(text) AS h_b FROM snap_b),
       |d AS (
       |  SELECT coalesce(a.src_a, b.src_b) AS source,
       |         CASE WHEN a.h_a IS NULL THEN 'added'
       |              WHEN b.h_b IS NULL THEN 'removed'
       |              WHEN a.h_a <> b.h_b THEN 'changed'
       |              ELSE 'unchanged' END AS change_class
       |  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id)
       |SELECT source, change_class, count(*) AS n_docs
       |FROM d
       |GROUP BY source, change_class
       |ORDER BY source, change_class""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x77_snapshot_diff" -> snapshotDiff _)

  val oracles: Map[String, String] = Map(
    "x77_snapshot_diff" -> snapshotDiffSql)
}
