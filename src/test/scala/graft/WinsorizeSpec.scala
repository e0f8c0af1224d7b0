package graft

import graft.ops.Winsorize

/** X55 — winsorized robust stats: fences must be exact order statistics,
  * clip counts exact, the clipped mean must match a driver-side fold,
  * and the fence join must broadcast (no second shuffle of the fact).
  */
class WinsorizeSpec extends SparkSpec {

  test("X55: fences, clip counts, and clipped mean match a driver-side fold") {
    val vals = Tables.events(spark, sfDir)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val byType = vals.groupBy(_._1)
    val rows = Winsorize.winsorize(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val xs = byType(t).map(_._2).sorted
      // PERCENTILE_DISC: smallest value whose cumulative share >= q
      def disc(q: Double): Double = xs(math.ceil(q * xs.length).toInt - 1)
      val (lo, hi) = (disc(Winsorize.Lo), disc(Winsorize.Hi))
      assert(r.getAs[Double]("p05") == lo, s"$t p05")
      assert(r.getAs[Double]("p95") == hi, s"$t p95")
      assert(r.getAs[Long]("n_events") == xs.length.toLong)
      assert(r.getAs[Long]("n_clipped_low") == xs.count(_ < lo).toLong, s"$t low")
      assert(r.getAs[Long]("n_clipped_high") == xs.count(_ > hi).toLong, s"$t high")
      val mean = xs.map(v => math.min(math.max(v, lo), hi)).sum / xs.length
      val got = r.getAs[Double]("winsorized_mean")
      assert(math.abs(got - mean) < 1e-9 * math.max(1.0, math.abs(mean)),
        s"$t mean: $got vs $mean")
      // winsorization bounds the mean inside the fences
      assert(got >= lo && got <= hi, s"$t mean outside fences")
    }
  }

  test("X55: fence join broadcasts — the fact shuffles only to aggregate") {
    val df = Winsorize.winsorize(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastHashJoin"),
      s"fences must broadcast onto the scan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"the fact must not shuffle for the fence join:\n$plan")
  }
}
