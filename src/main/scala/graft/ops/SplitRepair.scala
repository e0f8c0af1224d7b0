package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X66 — split-leakage repair: the actionable half of x61's audit. A
  * TRAIN document near-duplicate (X2-verified) of any val/test
  * document is dropped from train — the eval set is frozen, so the
  * training side yields — and the output is the full per-document
  * manifest (split, leak-link count, keep/drop) a training job
  * consumes directly. Within-split duplication is deliberately left
  * alone (that is x22's dedup job, not a leakage concern).
  *
  * Shape: split assignment stays the x61 row-local hash (no split
  * table); the implicated-doc list is two projections of the
  * (bucketed) X2 pair set unioned and count-aggregated — pair
  * cardinality, tiny — and the manifest is one left join of that
  * count onto the (doc_id, split) projection, keyed on doc_id. At
  * 100 TB the manifest join is the only document-cardinality stage,
  * and it's a co-partitioned key join.
  *
  * Parity: counts exact i64; action is a deterministic CASE of split
  * and count; ordered by doc_id.
  */
object SplitRepair {

  def splitRepair(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = Dedup.minhashLsh(spark, dir)
      .select($"doc_a", $"doc_b",
        SplitLeakage.splitOf($"doc_a").as("sa"),
        SplitLeakage.splitOf($"doc_b").as("sb"))

    val implicated = pairs
      .where($"sa" === "train" && $"sb" =!= "train")
      .select($"doc_a".as("doc_id"))
      .unionAll(pairs
        .where($"sb" === "train" && $"sa" =!= "train")
        .select($"doc_b".as("doc_id")))
      .groupBy($"doc_id").agg(count(lit(1)).as("n_leak_links"))

    Tables.documents(spark, dir)
      .select($"doc_id", SplitLeakage.splitOf($"doc_id").as("split"))
      .join(implicated, Seq("doc_id"), "left")
      .select($"doc_id", $"split",
        coalesce($"n_leak_links", lit(0L)).as("n_leak_links"),
        when($"split" === "train" && coalesce($"n_leak_links", lit(0L)) > 0,
          "drop").otherwise("keep").as("action"))
      .orderBy($"doc_id")
  }

  val splitRepairSql: String = {
    def s(c: String) = SplitLeakage.sqlSplitOf(c)
    s"""WITH pairs AS (
       |${Dedup.minhashLshSql}
       |),
       |tagged AS (
       |  SELECT doc_a, doc_b, ${s("doc_a")} AS sa, ${s("doc_b")} AS sb
       |  FROM pairs
       |),
       |implicated AS (
       |  SELECT doc_id, count(*) AS n_leak_links FROM (
       |    SELECT doc_a AS doc_id FROM tagged
       |    WHERE sa = 'train' AND sb <> 'train'
       |    UNION ALL
       |    SELECT doc_b AS doc_id FROM tagged
       |    WHERE sb = 'train' AND sa <> 'train'
       |  ) GROUP BY 1
       |)
       |SELECT d.doc_id, ${s("d.doc_id")} AS split,
       |       coalesce(n_leak_links, 0) AS n_leak_links,
       |       CASE WHEN ${s("d.doc_id")} = 'train'
       |                 AND coalesce(n_leak_links, 0) > 0
       |            THEN 'drop' ELSE 'keep' END AS action
       |FROM documents d
       |LEFT JOIN implicated i ON d.doc_id = i.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x66_split_repair" -> splitRepair _)

  val oracles: Map[String, String] = Map(
    "x66_split_repair" -> splitRepairSql)
}
