package graft

import graft.ops.Attribution

/** B48 — last-touch attribution: the rollup must equal a driver-side
  * replay of the per-user event timeline, and the plan must be the
  * single-window shape (no purchases×touches self-join).
  */
class AttributionSpec extends SparkSpec {

  test("B48: rollup equals a driver-side timeline replay") {
    val ev = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_type", "value", "event_id",
        "unix_micros(ts) AS us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getLong(3), r.getLong(4)))

    val lookback = 7L * 24 * 3600 * 1000000L
    val perUser = ev.groupBy(_._1)
    val attributed = perUser.toSeq.flatMap { case (_, xs) =>
      val sorted = xs.sortBy(x => (x._5, x._4))
      sorted.zipWithIndex.collect {
        case ((_, "purchase", value, _, us), i) =>
          val touch = sorted.take(i).reverse
            .find(x => x._2 == "view" || x._2 == "click")
          touch match {
            case Some((_, t, _, _, tus)) if us - tus <= lookback =>
              (t, value, Some(us - tus))
            case _ => ("organic", value, None)
          }
      }
    }
    val expected = attributed.groupBy(_._1).view.mapValues { xs =>
      val gaps = xs.flatMap(_._3)
      (xs.size.toLong,
        xs.map(x => BigDecimal(x._2).setScale(6,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble,
        gaps.sum.toDouble / (1e6 * math.max(1, gaps.size)))
    }.toMap

    val got = Attribution.lastTouch(spark, sfDir).collect()
    assert(got.map(_.getString(0)).toSet == expected.keySet)
    got.foreach { r =>
      val (n, v, gap) = expected(r.getString(0))
      assert(r.getLong(1) == n, s"n ${r.getString(0)}")
      assert(math.abs(r.getDouble(2) - v) < 1e-6, s"value ${r.getString(0)}")
      assert(java.lang.Double.compare(r.getDouble(3), gap) == 0,
        s"gap ${r.getString(0)}")
    }
  }

  test("B48: plan — one user window, no self-join") {
    val df = Attribution.lastTouch(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Join"), "no purchases×touches self-join")
    val windows = "(?m)^.*Window .*$".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("user_id")),
      windows.mkString("\n"))
  }
}
