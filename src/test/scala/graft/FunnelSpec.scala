package graft

import java.sql.Timestamp

import graft.ops.Funnel

/** X38 — funnel: ordered-sequence semantics pinned on a synthetic user
  * set covering every drop-off mode, plus the single-shuffle stacked-
  * window plan property.
  */
class FunnelSpec extends SparkSpec {

  private def ts(h: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
  private def tsd(d: Int, h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-${d + 1}%02d $h%02d:00:00")

  test("X38: every drop-off mode counts correctly") {
    import spark.implicits._
    val events = Seq(
      // A: completes view(1h) -> click(2h) -> purchase(3h)
      (1L, ts(1), "view", 1L), (1L, ts(2), "click", 2L), (1L, ts(3), "purchase", 3L),
      // B: clicks 25h after the first view — outside the 24h step window
      (2L, ts(1), "view", 4L), (2L, tsd(1, 2), "click", 5L),
      // C: purchase BEFORE the click — order violated, stops at click
      (3L, ts(1), "view", 6L), (3L, ts(2), "purchase", 7L), (3L, ts(4), "click", 8L),
      // D: no view at all — never enters the funnel
      (4L, ts(1), "click", 9L), (4L, ts(2), "purchase", 10L),
      // E: two views; click qualifies vs the FIRST view's window
      (5L, ts(1), "view", 11L), (5L, ts(5), "view", 12L), (5L, ts(9), "click", 13L)
    ).toDF("user_id", "ts", "event_type", "event_id")
    val rows = Funnel.funnelOf(events, 24).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows == Map("1_view" -> 4L, "2_click" -> 3L, "3_purchase" -> 1L))
  }

  test("X38: conversion rates are exact count ratios") {
    val rows = Funnel.funnel(spark, sfDir).collect()
    val n = rows.map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    val conv = rows.map(r => r.getAs[String]("stage") -> r.getAs[Double]("conv_from_prev")).toMap
    assert(n("1_view") >= n("2_click") && n("2_click") >= n("3_purchase"),
      "funnel must be monotone")
    assert(conv("2_click") == n("2_click").toDouble / n("1_view"))
    assert(conv("3_purchase") == n("3_purchase").toDouble / n("2_click"))
  }

  test("X39: retention triangle invariants hold on the corpus") {
    val rows = graft.ops.Funnel.cohortRetention(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[java.sql.Date]("cohort_day")).foreach { case (c, rs) =>
      val byOffset = rs.map(r =>
        r.getAs[Long]("offset_days") -> r.getAs[Long]("n_active")).toMap
      assert(byOffset.contains(0L), s"cohort $c missing day-0 row")
      val size = byOffset(0L)
      rs.foreach { r =>
        assert(r.getAs[Long]("offset_days") >= 0L, "activity before cohort day")
        assert(r.getAs[Long]("n_active") <= size,
          s"cohort $c retains more users than it has")
        assert(r.getAs[Double]("retention") ==
          r.getAs[Long]("n_active").toDouble / size)
      }
    }
    // cohort sizes sum to the distinct user count (every user in exactly
    // one cohort)
    val users = Tables.events(spark, sfDir)
      .select("user_id").distinct().count()
    val sizes = rows.filter(_.getAs[Long]("offset_days") == 0L)
      .map(_.getAs[Long]("n_active")).sum
    assert(sizes == users)
  }

  test("X40: transition rows are a proper Markov matrix") {
    import graft.ops.Funnel
    val rows = Funnel.eventTransitions(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-source probabilities sum to exactly 1 (i64 numerators over the
    // shared i64 denominator — no float accumulation involved)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val n = rs.map(_.getAs[Long]("n")).sum
      rs.foreach(r => assert(r.getAs[Double]("p") == r.getAs[Long]("n").toDouble / n))
      assert(math.abs(rs.map(_.getAs[Double]("p")).sum - 1.0) < 1e-12, s"$f")
    }
    // total transitions = events minus one per active user
    val events = Tables.events(spark, sfDir)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  test("X40: normalization windows over the aggregate, not the events") {
    val plan = graft.ops.Funnel.eventTransitions(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    // exactly two Window nodes total: the lead() over users and the
    // per-source sum over the tiny (from,to) aggregate — and the
    // aggregate must sit between them
    val windows = plan.linesIterator.count(_.contains("windowspecdefinition"))
    assert(windows == 2, s"expected lead + normalization windows:\n$plan")
    assert(plan.contains("Aggregate"), s"missing the (from,to) aggregate:\n$plan")
  }

  test("X38: one event shuffle feeding three stacked windows, no joins") {
    val plan = Funnel.funnel(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"funnel must not self-join the events:\n$plan")
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected the single user_id shuffle, got $hashExchanges:\n$plan")
    val windows = plan.linesIterator.count(_.contains("Window ["))
    assert(windows == 3, s"expected three stacked Window operators:\n$plan")
  }
}
