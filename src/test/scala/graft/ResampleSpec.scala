package graft

import graft.ops.Resample

/** B42 — resample + forward fill: the calendar must be gap-free over
  * each user's [first, last] active span, gap counts must equal the
  * driver-side reconstruction, the filled total must equal the
  * fill-forward fold, and the per-user window must not plan a global
  * (un-partitioned) window or a cartesian.
  */
class ResampleSpec extends SparkSpec {

  test("B42: gap counts and filled totals match a driver-side fill-forward") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(graft.functions.OracleSafe.dsum(col("value")).as("spend"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Double]("spend")))

    val rows = Resample.resampleFfill(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = daily.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val obs = byUser(u).map(d => d._2 -> d._3).toMap
      val d0 = obs.keys.min(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val d1 = obs.keys.max(Ordering.by((d: java.time.LocalDate) => d.toEpochDay))
      val span = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toSeq
      assert(r.getAs[Long]("n_days") == span.length.toLong, s"user $u span")
      assert(r.getAs[Long]("n_gap_days") == span.count(!obs.contains(_)).toLong,
        s"user $u gaps")
      var lastSeen = 0.0
      var total = BigDecimal(0)
      span.foreach { d =>
        lastSeen = obs.getOrElse(d, lastSeen)
        // BigDecimal.decimal == java valueOf == Spark's double→decimal path
        total += BigDecimal.decimal(lastSeen)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(r.getAs[Double]("filled_total") == total.toDouble,
        s"user $u filled total")
    }
    assert(rows.map(_.getAs[Long]("n_gap_days")).sum > 0,
      "fixture must actually contain gaps")
  }

  test("B42: per-user window plan — no global window, no cartesian") {
    val df = Resample.resampleFfill(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"the fill window must stay user-partitioned:\n$plan")
  }

  test("B53: interpolated totals match a driver-side linear replay") {
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(graft.functions.OracleSafe.dsum(col("value")).as("spend"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Double]("spend")))
    val rows = Resample.resampleInterp(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byUser = daily.groupBy(_._1)
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val obs = byUser(u).map(d => d._2 -> d._3).toMap
      val days = obs.keys.toSeq.sortBy(_.toEpochDay)
      val (d0, d1) = (days.head, days.last)
      val span = Iterator.iterate(d0)(_.plusDays(1))
        .takeWhile(!_.isAfter(d1)).toSeq
      assert(r.getAs[Long]("n_days") == span.length.toLong, s"user $u span")
      assert(r.getAs[Long]("n_interp_days") ==
        span.count(!obs.contains(_)).toLong, s"user $u interp days")
      var total = BigDecimal(0)
      span.foreach { d =>
        val v = obs.getOrElse(d, {
          val dp = days.filter(!_.isAfter(d)).last
          val dn = days.filter(_.isAfter(d)).head
          val (vp, vn) = (obs(dp), obs(dn))
          // the op's exact expression order
          vp + (vn - vp) * ((d.toEpochDay - dp.toEpochDay).toDouble
            / (dn.toEpochDay - dp.toEpochDay).toDouble)
        })
        total += BigDecimal.decimal(v)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      }
      assert(r.getAs[Double]("interp_total") == total.toDouble,
        s"user $u interp total")
    }
    assert(rows.map(_.getAs[Long]("n_interp_days")).sum > 0,
      "fixture must actually interpolate")
  }

  test("B53: both neighbor windows share one user-partitioned exchange") {
    // the INITIAL physical plan: the AQE-final tree collapses executed
    // stages, hiding the Window operators this structural check reads
    val plan = Resample.resampleInterp(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"interp windows must stay user-partitioned:\n$plan")
    // the backward and forward frames must not re-shuffle between them:
    // no Exchange line strictly between the two Window operators
    val lines = plan.linesIterator.toVector
    val winIdx = lines.zipWithIndex.filter(_._1.contains("Window ["))
      .map(_._2)
    assert(winIdx.length >= 2, s"expected two window frames:\n$plan")
    val between = lines.slice(winIdx.min + 1, winIdx.max)
    assert(!between.exists(_.contains("Exchange")),
      s"frames re-shuffled between windows:\n$plan")
  }
}
