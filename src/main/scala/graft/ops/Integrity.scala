package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B45 — referential-integrity audit: for every declared foreign key in
  * the star schema, count total references, DISTINCT referencing keys,
  * and orphans (references with no parent row) — the data-quality sweep
  * a warehouse runs after every load, and the quantified form of the
  * b06 anti-join primitive (which demonstrates the operator; this is
  * the audit topology built from it).
  *
  * Each relationship is one left-anti-shaped aggregate: the fact's key
  * multiset aggregates FIRST (map-side partials collapse references to
  * one row per distinct key — at 100 TB the orphan join then moves key
  * cardinality, not fact rows), the parent key set joins on the key,
  * and a null parent marks the orphan. The per-relationship results
  * union into one report; every branch is independent, so the DAG runs
  * them concurrently. Parent key sets ride broadcast when small (AQE
  * decides; nation always, customer at test scale) and degrade to keyed
  * shuffles at open scale — the plan is the same either way.
  *
  * Parity: pure i64 counts; per-relationship rows ordered by name.
  */
object Integrity {

  def integrityAudit(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._

    def audit(name: String, fact: DataFrame, key: String,
              parent: DataFrame, pkey: String): DataFrame = {
      val refs = fact.groupBy(col(key).as("k"))
        .agg(count(lit(1)).as("n_refs"))
      val parents = parent.select(col(pkey).as("pk")).distinct()
      refs.join(parents, $"k" === $"pk", "left")
        .agg(
          sum($"n_refs").as("n_references"),
          count(lit(1)).as("n_distinct_keys"),
          sum(when($"pk".isNull, $"n_refs").otherwise(0L)).as("n_orphan_refs"),
          sum(when($"pk".isNull, 1L).otherwise(0L)).as("n_orphan_keys"))
        .select(lit(name).as("relationship"), $"n_references",
          $"n_distinct_keys", $"n_orphan_refs", $"n_orphan_keys")
    }

    val li = Tables.lineitem(spark, dir)
    audit("lineitem.l_orderkey->orders", li, "l_orderkey",
        Tables.orders(spark, dir), "o_orderkey")
      .unionByName(audit("lineitem.l_partkey->part", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey"))
      .unionByName(audit("lineitem.l_suppkey->supplier", li, "l_suppkey",
        Tables.supplier(spark, dir), "s_suppkey"))
      .unionByName(audit("orders.o_custkey->customer",
        Tables.orders(spark, dir), "o_custkey",
        Tables.customer(spark, dir), "c_custkey"))
      .unionByName(audit("customer.c_nationkey->nation",
        Tables.customer(spark, dir), "c_nationkey",
        Tables.nation(spark, dir), "n_nationkey"))
      .orderBy($"relationship")
  }

  val integrityAuditSql: String = {
    def one(name: String, fact: String, key: String,
            parent: String, pkey: String): String =
      s"""SELECT '$name' AS relationship,
         |       CAST(sum(n_refs) AS BIGINT) AS n_references,
         |       count(*) AS n_distinct_keys,
         |       CAST(sum(CASE WHEN pk IS NULL THEN n_refs ELSE 0 END)
         |         AS BIGINT) AS n_orphan_refs,
         |       CAST(sum(CASE WHEN pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_orphan_keys
         |FROM (SELECT $key AS k, count(*) AS n_refs FROM $fact GROUP BY 1) r
         |LEFT JOIN (SELECT DISTINCT $pkey AS pk FROM $parent) p
         |  ON r.k = p.pk""".stripMargin
    Seq(
      one("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
        "orders", "o_orderkey"),
      one("lineitem.l_partkey->part", "lineitem", "l_partkey",
        "part", "p_partkey"),
      one("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
        "supplier", "s_suppkey"),
      one("orders.o_custkey->customer", "orders", "o_custkey",
        "customer", "c_custkey"),
      one("customer.c_nationkey->nation", "customer", "c_nationkey",
        "nation", "n_nationkey"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY relationship")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b45_integrity_audit" -> integrityAudit _)

  val oracles: Map[String, String] = Map(
    "b45_integrity_audit" -> integrityAuditSql)
}
