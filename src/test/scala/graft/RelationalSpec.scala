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

  test("b10c: grouping sets plan one Expand and a single aggregation shuffle") {
    val qe = Relational.aggGroupingSets(spark, sfDir).queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("Expand"), s"expected Expand for grouping sets:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected one agg shuffle, got $shuffles:\n$plan")
  }

  test("b12b: distribution values are exact rank ratios") {
    // cross-check percent_rank/cume_dist/ntile against a driver-side
    // recompute on one partition (exact integer ratios, no float slack)
    val byNation = Relational.windowDistribution(spark, sfDir)
      .collect().groupBy(_.getAs[Number]("c_nationkey").longValue)
    assert(byNation.nonEmpty && byNation.values.exists(_.length > 4))
    byNation.values.foreach { rows =>
      val n = rows.length
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Double]("pr") == (if (n == 1) 0.0 else i.toDouble / (n - 1)))
        assert(r.getAs[Double]("cd") == (i + 1).toDouble / n)
        // SQL ntile: first (n mod 4) buckets get the extra rows
        val big = n % 4; val base = n / 4
        val q = r.getAs[Long]("quartile").toInt
        val start = (q - 1) * base + math.min(q - 1, big)
        val sz = base + (if (q <= big) 1 else 0)
        assert(i >= start && i < start + sz, s"row $i in wrong quartile $q")
      }
    }
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

  test("b31: the correlated subquery decorrelates to an aggregate join") {
    val df = Relational.correlatedSubquery(spark, sfDir)
    // semantic spot-check: every surviving customer's count beats their
    // nation's average (recomputed driver-side)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val plan = df.queryExecution.executedPlan.toString
    // Catalyst must rewrite the per-row scalar subquery into an
    // aggregate + join — a subquery executed per outer row would appear
    // as a Subquery/ScalarSubquery node in the executed plan
    assert(!plan.toLowerCase.contains("scalarsubquery"),
      s"subquery not decorrelated:\n$plan")
    assert(plan.contains("Join"), s"expected the decorrelated join:\n$plan")
  }

  test("b32: RANGE frame includes the exact 7-day boundary and ts peers") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val events = Seq(
      // u1: e2 is EXACTLY 7 days after e1 (boundary inclusive);
      // e3 is 7 days + 1 second after e1 (e1 falls out of its frame)
      (1L, 1L, ts("2024-01-01 00:00:00"), 1.0),
      (2L, 1L, ts("2024-01-08 00:00:00"), 2.0),
      (3L, 1L, ts("2024-01-08 00:00:01"), 4.0),
      // u2: two events at the SAME timestamp are frame peers — both
      // rows see both values
      (4L, 2L, ts("2024-02-01 12:00:00"), 10.0),
      (5L, 2L, ts("2024-02-01 12:00:00"), 20.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = Relational.rangeFrameOf(events).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("n_7d"), r.getAs[Double]("sum_7d"))).toMap
    assert(got(1L) == (1L, 1.0))
    assert(got(2L) == (2L, 3.0), "the 7-day-old event is inside the frame")
    assert(got(3L) == (2L, 6.0), "e1 just aged out; e2 remains")
    assert(got(4L) == (2L, 30.0), "equal-ts peers share the frame")
    assert(got(5L) == (2L, 30.0))
  }

  test("b34: ALL set ops keep multiset multiplicity") {
    import spark.implicits._
    val got = Relational.setOpsAll(spark, sfDir).collect()
      .map(r => (r.getAs[String]("op"), r.getAs[Long]("l_orderkey")) ->
        r.getAs[Long]("n")).toMap
    // recompute one key's multiplicities driver-side
    val li = Tables.lineitem(spark, sfDir)
      .select($"l_orderkey", $"l_quantity", $"l_returnflag").collect()
    val aCnt = li.filter(_.getAs[Double]("l_quantity") > 30)
      .groupBy(_.getAs[Long]("l_orderkey")).view.mapValues(_.length).toMap
    val bCnt = li.filter(_.getAs[String]("l_returnflag") == "R")
      .groupBy(_.getAs[Long]("l_orderkey")).view.mapValues(_.length).toMap
    aCnt.keys.take(200).foreach { k =>
      val inter = math.min(aCnt(k), bCnt.getOrElse(k, 0))
      val exc = math.max(aCnt(k) - bCnt.getOrElse(k, 0), 0)
      assert(got.getOrElse(("intersect_all", k), 0L) == inter.toLong,
        s"intersect_all multiplicity for key $k")
      assert(got.getOrElse(("except_all", k), 0L) == exc.toLong,
        s"except_all multiplicity for key $k")
    }
  }

  test("b35: the null group survives the null-safe join") {
    val rows = Relational.nullSemantics(spark, sfDir).collect()
    val nullRow = rows.find(_.isNullAt(0))
    assert(nullRow.isDefined, "the null key must form its own group")
    assert(nullRow.get.getAs[Long]("n_nonnull") == 0L)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matched") == r.getAs[Long]("n_rows"),
        "null-safe join must match every group to itself, incl. null")
    }
    assert(rows.head.isNullAt(0), "explicit NULLS FIRST ordering")
  }

  test("b36: islands split exactly at day gaps") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(d: String) = Timestamp.valueOf(s"2024-01-$d 10:00:00")
    val events = Seq(
      // u1: 01-02-03 (one island, two events on the 02), gap, 05-06
      (1L, ts("01")), (1L, ts("02")), (1L, Timestamp.valueOf("2024-01-02 20:00:00")),
      (1L, ts("03")), (1L, ts("05")), (1L, ts("06")),
      // u2: a single lone day
      (2L, ts("10"))
    ).toDF("user_id", "ts")
    val islands = Relational.islandsOf(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_days"))
    assert(islands.filter(_._1 == 1L).map(_._2).sorted.toSeq == Seq(2L, 3L),
      "u1 must split into a 3-day and a 2-day island")
    assert(islands.filter(_._1 == 2L).map(_._2).toSeq == Seq(1L))
    // corpus smoke: islands tile each user's day set without overlap
    val rows = Relational.gapsIslands(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("island_start").toLocalDate.toEpochDay)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Date]("island_end").toLocalDate.toEpochDay + 1 <
            b.getAs[java.sql.Date]("island_start").toLocalDate.toEpochDay,
            "adjacent islands must be separated by a real gap")
        case _ =>
      }
      sorted.foreach { r =>
        val len = r.getAs[java.sql.Date]("island_end").toLocalDate.toEpochDay -
          r.getAs[java.sql.Date]("island_start").toLocalDate.toEpochDay + 1
        assert(len == r.getAs[Long]("n_days"), "islands must be dense")
      }
    }
  }

  test("b37: SCD2 intervals chain without gaps and collapse runs") {
    val rows = Relational.scd2History(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (c, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("version"))
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length.toLong), s"cust $c: versions must be dense")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // a version closes exactly where the next one opens
          assert(a.getAs[java.time.LocalDateTime]("valid_to") ==
            b.getAs[java.time.LocalDateTime]("valid_from"), s"cust $c: gap in history")
          // consecutive versions differ in the attribute (runs collapsed)
          assert(a.getAs[String]("o_orderpriority") !=
            b.getAs[String]("o_orderpriority"), s"cust $c: uncollapsed run")
        case _ =>
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to")),
        s"cust $c: current version must be open-ended")
    }
  }

  test("b38: ntile buckets are balanced with extras in earlier buckets") {
    val rows = Relational.ntileBuckets(spark, sfDir).collect()
    rows.groupBy(_.getAs[Long]("o_custkey")).foreach { case (c, rs) =>
      val sizes = rs.sortBy(_.getAs[Int]("quartile"))
        .map(_.getAs[Long]("n_orders"))
      assert(sizes.max - sizes.min <= 1, s"cust $c: unbalanced $sizes")
      assert(sizes.sameElements(sizes.sortBy(-_)),
        s"cust $c: ntile puts the extra rows in the EARLIER buckets")
    }
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
