package graft

import graft.ops.Basket

/** B46 — basket pair lift: counts and lift must equal driver-side set
  * arithmetic over the distinct (user, type) baskets, and the pair join
  * must be a user-keyed equi-join over PRE-AGGREGATED baskets (never a
  * cartesian, never raw event rows).
  */
class BasketSpec extends SparkSpec {

  test("B46: pair counts and lift equal driver-side basket arithmetic") {
    val baskets = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = baskets.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).toSet }
    val nUsers = baskets.map(_._1).distinct.length.toLong

    val got = Basket.pairLift(spark, sfDir).collect()
    assert(got.nonEmpty)
    // every unordered type pair with ≥1 shared user appears exactly once
    val types = byType.keys.toSeq.sorted
    val expectedPairs = for {
      a <- types; b <- types if a < b
      both = (byType(a) & byType(b)).size if both > 0
    } yield (a, b)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      expectedPairs)

    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val both = (byType(a) & byType(b)).size.toLong
      assert(r.getLong(2) == both, s"n_users_both $a/$b")
      assert(r.getLong(3) == byType(a).size.toLong, s"n_users_a $a")
      assert(r.getLong(4) == byType(b).size.toLong, s"n_users_b $b")
      val lift = (both * nUsers).toDouble /
        (byType(a).size.toLong * byType(b).size.toLong).toDouble
      assert(java.lang.Double.compare(r.getDouble(5), lift) == 0,
        s"lift $a/$b")
    }
  }

  test("B46: plan — equi-join over aggregated baskets, no cartesian") {
    val df = Basket.pairLift(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), "no cartesian pair join")
    // the self-join keys on user_id (co-partitioned equi-join)
    assert(plan.contains("HashAggregate"), "baskets aggregate before pairing")
    // the one-row totals ride a broadcast, not a shuffle
    assert(plan.contains("BroadcastExchange"), "totals broadcast")
  }
}
