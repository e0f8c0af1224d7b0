package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X108 — rendezvous (highest-random-weight) sharding + re-shard
  * movement audit: every document is assigned to the shard whose
  * per-(shard, doc) hash is highest, under the CURRENT ([[NOld]]) and
  * the GROWN ([[NNew]] = NOld+1) shard counts, and the op emits the
  * (shard_old, shard_new) transition matrix — the re-sharding cost
  * plan. Rendezvous hashing is THE stable assignment scheme for
  * growing a shard fleet: where `hash(doc) mod n` reshuffles
  * (n−1)/n of the corpus when n grows, HRW moves ONLY the docs whose
  * new shard's hash beats their old winner — i.e. every off-diagonal
  * transition lands on the ADDED shard, ~1/(n+1) of the corpus in
  * expectation. X42/X83 decide what goes in a shard for one snapshot;
  * X108 is the audit for changing the shard COUNT under a live corpus
  * (re-crawl, capacity add) without a full rewrite.
  *
  * The movement-only-to-new-shard property is not asserted — it is
  * PINNED structurally in the spec and visible in the output: any
  * (old ≠ new, new ≠ NOld) row would be a bug, and none can exist by
  * the argmax monotonicity argument (adding a candidate never changes
  * the relative order of the existing ones).
  *
  * Exactness: weights are the portable `md5Long40('x108|' || shard ||
  * '|' || doc_id)`; argmax is `greatest(...)` plus a FIRST-MATCH CASE
  * chain in ascending shard order, so the lowest shard id wins hash
  * ties — the same linear expression in both engines; with a 40-bit
  * hash over distinct inputs ties are already vanishing, but the
  * first-match rule makes determinism unconditional, not
  * probabilistic.
  *
  * Scale shape: assignment is ROW-LOCAL (NNew hash evaluations in the
  * scan projection — no join, no shuffle, exactly how a router computes
  * it per record); the transition matrix is one map-side-combined
  * hash-agg bounded by NOld·NNew cells. Nothing global but the final
  * ORDER BY.
  *
  * Reference scope: no sharding ops in the reference; engine extension
  * (SURVEY §2.5, the X35/X42/X83 layout family).
  */
object Rendezvous {

  val NOld = 8
  val NNew = 9

  private def weight(shard: Int): Column =
    Hashing.md5Long40(concat(lit(s"x108|$shard|"), col("doc_id").cast("string")))

  /** Argmax over shards 0..n-1: `greatest` of the weights plus a
    * first-match CASE in ascending shard order (lowest id wins ties).
    */
  private def argmax(n: Int): Column = {
    val ws = (0 until n).map(weight)
    val g = greatest(ws: _*)
    (1 until n).foldLeft(when(ws(0) === g, lit(0))) {
      (acc, i) => acc.when(ws(i) === g, lit(i))
    }.cast("long")
  }

  def reshardAudit(spark: SparkSession, dir: String): DataFrame =
    reshardAuditOf(Tables.documents(spark, dir))

  /** Core of X108 over any (doc_id) frame; test seam. */
  private[graft] def reshardAuditOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select($"doc_id", argmax(NOld).as("shard_old"),
        argmax(NNew).as("shard_new"))
      .groupBy($"shard_old", $"shard_new")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy($"shard_old", $"shard_new")
  }

  val reshardAuditSql: String = {
    def w(shard: Int): String =
      Hashing.sqlMd5Long40(s"'x108|$shard|' || CAST(doc_id AS VARCHAR)")
    def argmaxSql(n: Int): String = {
      // same greatest + first-match chain as the engine, over the hash
      // columns materialized in the `h` CTE
      val g = (0 until n).map(i => s"h$i").mkString("greatest(", ", ", ")")
      (0 until n).map(i => s"WHEN h$i = $g THEN $i")
        .mkString("CASE ", " ", " END")
    }
    val hashCols = (0 until NNew).map(i => s"${w(i)} AS h$i").mkString(",\n         ")
    s"""WITH h AS (
       |  SELECT doc_id,
       |         $hashCols
       |  FROM documents),
       |a AS (
       |  SELECT doc_id,
       |         CAST(${argmaxSql(NOld)} AS BIGINT) AS shard_old,
       |         CAST(${argmaxSql(NNew)} AS BIGINT) AS shard_new
       |  FROM h)
       |SELECT shard_old, shard_new, CAST(count(*) AS BIGINT) AS n_docs
       |FROM a
       |GROUP BY 1, 2
       |ORDER BY shard_old, shard_new""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x108_reshard_audit" -> reshardAudit _)

  val oracles: Map[String, String] = Map(
    "x108_reshard_audit" -> reshardAuditSql)
}
