package graft

import graft.ops.Profile

/** X25 — table profiling: metric invariants plus the load-bearing plan
  * properties (per-column branches must each scan ONLY their own column,
  * and the Expand-based multi-distinct funnel must not appear — it
  * multiplies rows × profiled-columns through a single aggregation and
  * was the round-6 bench's worst entry).
  */
class ProfileSpec extends SparkSpec {

  test("X25: profile metrics are internally consistent") {
    val nRows = Tables.lineitem(spark, sfDir).count()
    val rows = Profile.dataProfile(spark, sfDir).collect()
    assert(rows.length == 11, "one row per profiled lineitem column")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") == nRows)
      val nulls = r.getAs[Long]("n_nulls")
      val distinct = r.getAs[Long]("n_distinct")
      assert(nulls >= 0 && nulls <= nRows)
      assert(distinct >= 1 && distinct <= nRows - nulls)
      val mn = r.getAs[String]("min_val")
      val mx = r.getAs[String]("max_val")
      assert((mn == null) == (mx == null), "min/max emitted together or not at all")
    }
    // key column: no nulls, and orderkey min is a real key value
    val key = rows.find(_.getAs[String]("col_name") == "l_orderkey").get
    assert(key.getAs[Long]("n_nulls") == 0L)
    assert(key.getAs[String]("min_val").toLong >= 0L)
  }

  test("X34: percentiles are order statistics of the real value set") {
    import org.apache.spark.sql.functions.col
    val rows = Profile.percentileProfile(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byType = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.map(_.getAs[Double]("value")).sorted).toMap
    rows.foreach { r =>
      val vals = byType(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_events") == vals.length.toLong)
      val seq = Seq("min_val", "p10", "p50", "p90", "p99", "max_val")
        .map(c => r.getAs[Double](c))
      assert(seq == seq.sorted, s"percentiles out of order: $seq")
      // PERCENTILE_DISC picks existing values — bit-exact membership
      seq.foreach(v => assert(vals.contains(v), s"$v not an actual value"))
      // p50 is the standard smallest-value-with-cume_dist>=0.5 statistic
      assert(r.getAs[Double]("p50") ==
        vals((math.ceil(vals.length * 0.5) - 1).toInt))
    }
  }

  test("X37: heavy hitters are the true top-k with exact shares") {
    val rows = Profile.heavyHitters(spark, sfDir).collect()
    val li = Tables.lineitem(spark, sfDir).collect()
    val total = li.length.toDouble
    Seq("l_returnflag", "l_partkey").foreach { c =>
      val counts = li.groupBy(_.getAs[Any](c).toString)
        .view.mapValues(_.length.toLong).toMap
      val want = counts.toSeq.sortBy { case (v, n) => (-n, v) }
        .take(Profile.TopK)
      val got = rows.filter(_.getAs[String]("col_name") == c)
        .map(r => (r.getAs[String]("val"), r.getAs[Long]("cnt")))
      assert(got.toSeq == want, s"$c top-k mismatch")
      rows.filter(_.getAs[String]("col_name") == c).foreach(r =>
        assert(r.getAs[Double]("share") == r.getAs[Long]("cnt") / total))
    }
  }

  test("X37: per-branch top-k plans as TakeOrdered, never a global sort") {
    val plan = Profile.heavyHitters(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"branch top-k must be TakeOrderedAndProject:\n$plan")
    // only the final presentation ORDER BY may sort globally (the AQE
    // pre-final plan elides its exchange, so count global Sort nodes)
    val globalSorts = plan.linesIterator
      .count(l => l.contains("Sort [") && l.contains("], true"))
    assert(globalSorts == 1,
      s"unexpected global sorts in branch top-k:\n$plan")
  }

  test("X25: branches are pruned single-column scans with no Expand funnel") {
    val plan = Profile.dataProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    // no Expand: the multi-distinct single-agg form multiplies every row
    // by the profiled-column count before aggregating
    assert(!plan.contains("Expand"),
      s"found the rows×columns Expand funnel:\n$plan")
    // each branch's parquet scan must read exactly one column (pruning
    // pushed through the union): every ReadSchema lists a single field
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(schemas.length == 11, s"expected 11 branch scans:\n$plan")
    schemas.foreach { s =>
      assert(!s.contains(","), s"branch scan reads more than one column: $s")
    }
    // branch parallelism comes from the concurrent union arms — a
    // round-robin fan-out ahead of them measured 4× slower
    assert(!plan.contains("roundrobin"),
      s"unexpected repartition in the profile plan:\n$plan")
  }

  test("B51: median/MAD equal a driver-side order-statistic replay") {
    import org.apache.spark.sql.functions.col
    val raw = Tables.events(spark, sfDir)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
    // percentile_disc(0.5): smallest value with cumulative share >= 0.5,
    // i.e. the ceil(n/2)-th order statistic (1-indexed)
    def disc(vs: Seq[Double]): Double = {
      val s = vs.sorted
      s((math.ceil(s.length * 0.5) - 1).toInt)
    }
    val want = raw.toSeq.groupBy(_._1).map { case (t, vs) =>
      val values = vs.map(_._2)
      val med = disc(values)
      t -> (values.length.toLong, med, disc(values.map(v => math.abs(v - med))))
    }
    val got = Profile.robustMad(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("median_value"),
          r.getAs[Double]("mad"))).toMap
    assert(got.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (t, (n, med, mad)) =>
      assert(got(t) == ((n, med, mad)), s"type $t")
    }
  }

  test("B51: medians broadcast back onto the stream, no window") {
    val plan = Profile.robustMad(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"group medians must broadcast onto the fact stream:\n$plan")
    assert(!plan.contains("Window"),
      s"no window in the MAD plan:\n$plan")
  }
}
