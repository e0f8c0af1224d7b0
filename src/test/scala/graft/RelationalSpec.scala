package graft

import org.apache.spark.sql.functions._

import graft.ops.Relational

/** Plan-shape and approximate-aggregate assertions the DuckDB oracle
  * can't express (SURVEY.md §5.2).
  */
class RelationalSpec extends SparkSpec {

  test("b01: filter and projection are pushed into the parquet scan") {
    val plan = Relational.scanPushdown(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:"), s"no pushdown in plan:\n$plan")
    assert(plan.contains("GreaterThanOrEqual(l_shipdate"),
      s"shipdate range not pushed:\n$plan")
    // column pruning: the scan schema must not include unprojected columns
    assert(!plan.contains("l_extendedprice"), s"scan not pruned:\n$plan")
  }

  test("b03: dimension sides broadcast, fact side does not shuffle for the join") {
    val plan = Relational.joinBroadcastStar(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("b11: HLL estimate within tolerance of exact count") {
    val rows = Relational.approxDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val exact = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"estimate $approx vs exact $exact beyond 5x rsd")
    }
  }

  test("b15: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Relational.topK(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k not heap-based:\n$plan")
  }

  test("percentile_approx stays within rank tolerance of exact percentile") {
    // the approx variant of X7's median (no bit-exact oracle possible)
    val df = Tables.documents(spark, sfDir)
      .agg(
        expr("percentile(n_chars, 0.5)").as("exact"),
        expr("percentile_approx(n_chars, 0.5, 1000)").as("approx"))
    val r = df.collect()(0)
    val exact = r.getAs[Double]("exact")
    val approx = r.getAs[Long]("approx").toDouble
    assert(math.abs(approx - exact) / math.max(exact, 1.0) <= 0.05,
      s"approx median $approx far from exact $exact")
  }
}
