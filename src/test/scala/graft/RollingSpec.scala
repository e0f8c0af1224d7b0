package graft

import graft.ops.Rolling

/** B43 — rolling distinct: the contribution-explode rewrite must equal
  * a driver-side trailing-window recount, fan-out must be exactly
  * WindowDays per (user, day), and the plan must stay a two-phase
  * aggregate (no quadratic re-scan, no single-task funnel).
  */
class RollingSpec extends SparkSpec {

  test("B43: equals the brute-force trailing-window distinct recount") {
    import org.apache.spark.sql.functions._
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate))
    val maxDay = ud.map(_._2).maxBy(_.toEpochDay)

    val rows = Rolling.rollingDistinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[java.sql.Date]("target_day").toLocalDate
      assert(!t.isAfter(maxDay), "no phantom days past observed time")
      val inWindow = ud.filter { case (_, d) =>
        !d.isAfter(t) && d.isAfter(t.minusDays(Rolling.WindowDays))
      }
      assert(r.getAs[Long]("active_users") ==
        inWindow.map(_._1).distinct.length.toLong, s"day $t distinct")
      assert(r.getAs[Long]("n_contributions") == inWindow.length.toLong,
        s"day $t contributions")
    }
    // every observed day must be present as a target day
    val targets = rows.map(_.getAs[java.sql.Date]("target_day").toLocalDate).toSet
    assert(ud.map(_._2).toSet.subsetOf(targets))
  }

  test("B43: two-phase aggregate plan — no window operator, no funnel") {
    val df = Rolling.rollingDistinct(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Window"),
      s"rolling distinct must be the contribution rewrite, not a window:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(plan.contains("partial"),
      s"distinct count needs map-side partials:\n$plan")
  }
}
