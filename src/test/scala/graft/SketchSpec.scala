package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin
import graft.ops.Sketch

/** X45 — Count-Min sketch: the estimator guarantees (never
  * underestimates, error bounded by the stream total), merge
  * commutativity / partition invariance, and the one-broadcast plan.
  */
class SketchSpec extends SparkSpec {

  test("X45: estimates never underestimate and overflow is bounded") {
    val rows = Sketch.cmsUserCounts(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("c_exact")).sum
    rows.foreach { r =>
      val (exact, est) = (r.getAs[Long]("c_exact"), r.getAs[Long]("c_est"))
      assert(est >= exact,
        s"CMS must never underestimate: user ${r.getAs[Long]("user_id")}")
      // ε = e/W per row; with Depth independent rows the expected
      // overshoot is far below this — assert the hard bound only
      assert(est - exact <= (math.E / CountMin.W * total).toLong + 1,
        s"overestimate beyond the CMS bound for user ${r.getAs[Long]("user_id")}")
    }
  }

  test("X45: the sketch is partition-invariant (merge commutes)") {
    import spark.implicits._
    val ev = Tables.events(spark, sfDir)
      .select(graft.functions.Hashing.md5Long40($"user_id".cast("string")).as("h"))
    val cms = udaf(CountMin)
    val a = ev.agg(cms($"h")).collect()(0).getSeq[Long](0)
    val b = ev.repartition(7).agg(cms($"h")).collect()(0).getSeq[Long](0)
    assert(a == b, "sketch must not depend on partitioning")
    assert(a.sum == ev.count() * CountMin.Depth,
      "every input increments exactly one cell per row")
  }

  test("X45: one sketch broadcast, no extra exchange on the probe side") {
    val df = Sketch.cmsUserCounts(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"the one-row sketch must broadcast, not shuffle:\n$plan")
  }
}
