package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X61 — train/val/test split with a near-dup leakage audit: assign
  * every document to a split by a deterministic content-independent
  * hash of its id (80/10/10), then attribute the verified near-dup
  * pairs (the X2 LSH + exact-Jaccard output) to split pairs. A
  * cross-split row IS evaluation leakage — the val/test example whose
  * near-copy sits in train — the audit every LLM data pipeline runs
  * before freezing an eval set; the diagonal is within-split
  * duplication (a training-efficiency, not leakage, signal).
  *
  * Shape: the split is a row-local pure function of doc_id
  * (md5Long40 mod 100 bucketed 80/10/10) — no split table exists, no
  * join materializes it; pairs get both side's splits as two map-side
  * projections. Downstream of the (bucketed) X2 pair producer the
  * audit moves pair cardinality only: one aggregate counts pairs per
  * orientation-normalized split pair, a second counts DISTINCT
  * involved docs over the exploded (pair → two rows) view, and the
  * two ≤ 6-row results join on the split pair. At 100 TB the split
  * function is free, and everything else is the X2 cost.
  *
  * Parity: md5Long40 is engine-portable by construction; counts are
  * exact i64; split names orientation-normalize with least/greatest
  * so (train,val) and (val,train) pool.
  */
object SplitLeakage {

  /** 80/10/10 split as a pure row-local function of the id column. */
  private[graft] def splitOf(id: Column): Column = {
    val b = Hashing.md5Long40(concat(lit("split|"), id.cast("string"))) % 100
    when(b < 80, "train").when(b < 90, "val").otherwise("test")
  }

  private[graft] def sqlSplitOf(expr: String): String = {
    val h = Hashing.sqlMd5Long40(s"'split|' || CAST($expr AS VARCHAR)")
    s"CASE WHEN $h % 100 < 80 THEN 'train' " +
      s"WHEN $h % 100 < 90 THEN 'val' ELSE 'test' END"
  }

  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tagged = Dedup.minhashLsh(spark, dir)
      .select(
        least(splitOf($"doc_a"), splitOf($"doc_b")).as("split_a"),
        greatest(splitOf($"doc_a"), splitOf($"doc_b")).as("split_b"),
        $"doc_a", $"doc_b")

    val nPairs = tagged.groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("n_pairs"))
    val nDocs = tagged
      .select($"split_a", $"split_b",
        explode(array($"doc_a", $"doc_b")).as("doc"))
      .groupBy($"split_a", $"split_b")
      .agg(countDistinct($"doc").as("n_docs"))

    nPairs.join(nDocs, Seq("split_a", "split_b"))
      .withColumn("is_leak", $"split_a" =!= $"split_b")
      .orderBy($"split_a", $"split_b")
  }

  val splitLeakageSql: String =
    s"""WITH pairs AS (
       |${Dedup.minhashLshSql}
       |),
       |tagged AS (
       |  SELECT least(${sqlSplitOf("doc_a")}, ${sqlSplitOf("doc_b")})
       |           AS split_a,
       |         greatest(${sqlSplitOf("doc_a")}, ${sqlSplitOf("doc_b")})
       |           AS split_b,
       |         doc_a, doc_b
       |  FROM pairs
       |)
       |SELECT p.split_a, p.split_b, n_pairs, n_docs,
       |       p.split_a <> p.split_b AS is_leak
       |FROM (SELECT split_a, split_b, count(*) AS n_pairs
       |      FROM tagged GROUP BY 1, 2) p
       |JOIN (SELECT split_a, split_b, count(DISTINCT doc) AS n_docs
       |      FROM (SELECT split_a, split_b,
       |                   unnest([doc_a, doc_b]) AS doc
       |            FROM tagged) GROUP BY 1, 2) d
       |  ON p.split_a = d.split_a AND p.split_b = d.split_b
       |ORDER BY p.split_a, p.split_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x61_split_leakage" -> splitLeakage _)

  val oracles: Map[String, String] = Map(
    "x61_split_leakage" -> splitLeakageSql)
}
