package graft

import org.apache.spark.sql.functions._

import graft.ops.BloomPrune

/** B55 — Bloom-pruned semi-join: the pruned plan must produce exactly
  * the plain semi-join's answer (the filter is lossless by
  * construction), the bloom pre-filter must actually sit in the plan,
  * and the prune must be non-trivial on the fixture.
  */
class BloomPruneSpec extends SparkSpec {

  import spark.implicits._

  test("B55: pruned plan equals the plain semi-join bit-for-bit") {
    val plain = Tables.lineitem(spark, sfDir)
      .join(Tables.orders(spark, sfDir)
          .filter($"o_totalprice" > BloomPrune.PriceFloor)
          .select($"o_orderkey"),
        $"l_orderkey" === $"o_orderkey", "left_semi")
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        graft.functions.OracleSafe.dsum(
          $"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue_q"))
      .orderBy($"l_returnflag")
    val a = BloomPrune.bloomPrunedSemiJoin(spark, sfDir).collect().toSeq
    val b = plain.collect().toSeq
    assert(a.nonEmpty && a == b,
      "bloom pre-filter changed the answer — it must be lossless")
  }

  test("B55: the bloom probe is in the plan and the prune is non-trivial") {
    val df = BloomPrune.bloomPrunedSemiJoin(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      "BloomFilterMightContain missing from the physical plan")
    // the floor must actually split the orders — otherwise the op
    // demonstrates nothing on this fixture
    val orders = Tables.orders(spark, sfDir)
    val hot = orders.filter($"o_totalprice" > BloomPrune.PriceFloor).count()
    val all = orders.count()
    assert(hot > 0 && hot < all,
      s"PriceFloor splits nothing: $hot of $all orders qualify")
  }
}
