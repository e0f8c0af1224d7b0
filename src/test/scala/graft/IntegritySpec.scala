package graft

import graft.ops.Integrity

/** B45 — integrity audit: counts must equal driver-side set arithmetic
  * per relationship, and the orphan joins must move key cardinality
  * (aggregate-before-join), not fact rows.
  */
class IntegritySpec extends SparkSpec {

  test("B45: per-relationship counts equal driver-side set arithmetic") {
    def keys(table: String, col: String): Seq[Long] =
      Tables.load(spark, sfDir, table)
        .selectExpr(s"CAST($col AS BIGINT) AS k").collect().map(_.getLong(0))

    val cases = Seq(
      ("lineitem.l_orderkey->orders", keys("lineitem", "l_orderkey"),
        keys("orders", "o_orderkey")),
      ("lineitem.l_partkey->part", keys("lineitem", "l_partkey"),
        keys("part", "p_partkey")),
      ("lineitem.l_suppkey->supplier", keys("lineitem", "l_suppkey"),
        keys("supplier", "s_suppkey")),
      ("orders.o_custkey->customer", keys("orders", "o_custkey"),
        keys("customer", "c_custkey")),
      ("customer.c_nationkey->nation", keys("customer", "c_nationkey"),
        keys("nation", "n_nationkey")))

    val got = Integrity.integrityAudit(spark, sfDir).collect()
      .map(r => r.getAs[String]("relationship") ->
        ((r.getAs[Long]("n_references"), r.getAs[Long]("n_distinct_keys"),
          r.getAs[Long]("n_orphan_refs"), r.getAs[Long]("n_orphan_keys"))))
      .toMap
    assert(got.size == cases.size)
    cases.foreach { case (name, refs, parents) =>
      val parentSet = parents.toSet
      val orphanRefs = refs.count(!parentSet(_)).toLong
      val distinctRefs = refs.distinct
      assert(got(name) == ((refs.length.toLong, distinctRefs.length.toLong,
        orphanRefs, distinctRefs.count(!parentSet(_)).toLong)), name)
    }
  }

  test("B45: aggregate-before-join — the orphan join sees distinct keys") {
    val df = Integrity.integrityAudit(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // every join input that comes from a fact table must be an aggregate
    // (the refs subplan), never the raw scan — spot-check by operator
    // order: no SortMergeJoin directly over a parquet scan of lineitem
    assert(plan.contains("partial_count"),
      s"reference counts need map-side partials:\n$plan")
  }
}
