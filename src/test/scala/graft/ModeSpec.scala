package graft

import graft.ops.Mode

/** B52 — grouped mode: must equal a driver-side frequency replay with
  * the smallest-value tiebreak, and plan as two chained partial
  * aggregates (no window, no per-group sort).
  */
class ModeSpec extends SparkSpec {

  test("B52: mode equals a driver-side frequency replay") {
    import org.apache.spark.sql.functions.col
    val raw = Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity")).collect()
      .map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[Double]("l_quantity").toLong))
    val want = raw.toSeq.groupBy(_._1).map { case (f, qs) =>
      val freq = qs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      // argmax count, ties to the smallest value — the struct order
      val (qty, cnt) = freq.toSeq.minBy { case (q, c) => (-c, q) }
      f -> (qty, cnt, freq.size.toLong)
    }
    val got = Mode.groupedMode(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") ->
        (r.getAs[Long]("mode_qty"), r.getAs[Long]("mode_cnt"),
          r.getAs[Long]("n_distinct_values"))).toMap
    assert(got.nonEmpty && got.keySet == want.keySet)
    want.foreach { case (f, w) => assert(got(f) == w, s"flag $f") }
  }

  test("B52: two chained partial aggregates, no window, no group sort") {
    val plan = Mode.groupedMode(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"mode must be the struct-argmax aggregate, not a window:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial"),
      s"argmax must merge map-side:\n$plan")
  }
}
