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

  test("B53: interpolated totals match a day-level exact-rational replay") {
    // The op never materializes gap days (it folds each gap with the
    // trapezoid identity), so this replay deliberately DOES: it walks
    // every span day, forms the linear value qp + (qn−qp)·k/g as an
    // exact BigInt rational in cents, and sums the rationals — an
    // independent derivation that would catch an identity mistake.
    import org.apache.spark.sql.functions._
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100).cast("long")).as("q"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[java.sql.Date]("day").toLocalDate, r.getAs[Long]("q")))
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
      // running rational total in cents: num / den
      var num = BigInt(0); var den = BigInt(1)
      span.foreach { d =>
        val (n2, d2) = obs.get(d) match {
          case Some(q) => (BigInt(q), BigInt(1))
          case None =>
            val dp = days.filter(!_.isAfter(d)).last
            val dn = days.filter(_.isAfter(d)).head
            val g = BigInt(dn.toEpochDay - dp.toEpochDay)
            val k = BigInt(d.toEpochDay - dp.toEpochDay)
            (BigInt(obs(dp)) * g + BigInt(obs(dn) - obs(dp)) * k, g)
        }
        num = num * d2 + n2 * den
        den = den * d2
      }
      // total cents = num/den must be an exact multiple of a half-cent,
      // and the op's double must be that integer H divided by 200
      assert((num * 2) % den == 0, s"user $u total is not half-cent exact")
      val halfCents = (num * 2 / den).toLong
      assert(r.getAs[Double]("interp_total") == halfCents.toDouble / 200.0,
        s"user $u interp total")
    }
    assert(rows.map(_.getAs[Long]("n_interp_days")).sum > 0,
      "fixture must actually interpolate")
  }

  test("B53: single user-partitioned lag window, no calendar explode") {
    // the INITIAL physical plan: the AQE-final tree collapses executed
    // stages, hiding the operators this structural check reads
    val plan = Resample.resampleInterp(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange SinglePartition"),
      s"the lag window must stay user-partitioned:\n$plan")
    assert(!plan.contains("Generate"),
      s"b53 must not explode a calendar (gaps fold via the trapezoid " +
        s"identity):\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
