package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopKLongPairs
import graft.ops.GroupedTopK

/** B56 — grouped top-k via the bounded-pair aggregator: unit paths of
  * the aggregator itself, equality against the window form on the real
  * orders, and the partial-aggregation plan pin that is the operator's
  * reason to exist.
  */
class GroupedTopKSpec extends SparkSpec {

  import spark.implicits._

  private val agg = new TopKLongPairs(3)

  private def reduceAll(vs: Seq[(Long, Long)]): Array[Long] =
    vs.foldLeft(agg.zero)(agg.reduce)

  test("B56 aggregator: insertion keeps the k smallest pairs sorted") {
    val buf = reduceAll(Seq((5L, 1L), (1L, 9L), (3L, 3L), (1L, 2L), (7L, 0L)))
    assert(buf.toSeq == Seq(1L, 2L, 1L, 9L, 3L, 3L))
    // worse-than-worst on a full buffer is a no-op (same array back)
    val same = agg.reduce(buf, (9L, 9L))
    assert(same eq buf)
  }

  test("B56 aggregator: merge of partials equals reduce over the union") {
    val xs = Seq((4L, 4L), (2L, 2L), (8L, 8L), (2L, 1L))
    val ys = Seq((1L, 1L), (3L, 3L), (2L, 2L), (0L, 5L))
    val merged = agg.merge(reduceAll(xs), reduceAll(ys))
    assert(merged.toSeq == reduceAll(xs ++ ys).toSeq)
    // associativity/commutativity spot check
    assert(agg.merge(reduceAll(ys), reduceAll(xs)).toSeq == merged.toSeq)
    assert(agg.merge(agg.zero, reduceAll(xs)).toSeq == reduceAll(xs).toSeq)
  }

  test("B56: equals the window row_number form on real orders") {
    val orders = Tables.orders(spark, sfDir)
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"price_cents".desc, $"o_orderkey")
    val expected = orders
      .select($"o_custkey", $"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("price_cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= GroupedTopK.K)
      .select($"o_custkey", $"rk", $"o_orderkey", $"price_cents")
      .orderBy($"o_custkey", $"rk")
      .collect()
    val got = GroupedTopK.groupedTopK(spark, sfDir).collect()
    assert(got.toSeq == expected.toSeq)
  }

  test("B56: ties on price break by order key, groups smaller than k keep all") {
    val orders = Seq(
      (10L, 100L, 5.00), (10L, 101L, 5.00), (10L, 102L, 5.00), (10L, 103L, 5.00),
      (20L, 200L, 1.00))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val got = GroupedTopK.groupedTopKOf(orders)
      .select($"o_custkey", $"rk", $"o_orderkey").as[(Long, Long, Long)]
      .collect().toSeq
    assert(got == Seq((10L, 1L, 100L), (10L, 2L, 101L), (10L, 3L, 102L),
      (20L, 1L, 200L)))
  }

  test("B56 plan: runs as a partial ObjectHashAggregate, not a window") {
    val plan = GroupedTopK.groupedTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.toLowerCase.contains("partial_topklongpairs"),
      s"expected a partial aggregation phase in:\n$plan")
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      "grouped top-k must not fall back to a window")
  }
}
