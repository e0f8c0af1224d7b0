package graft

import graft.ops.Profile

/** X25 — table profiling: metric invariants plus the load-bearing plan
  * property (ONE scan for all columns' metrics — per-column jobs are the
  * anti-pattern this operator exists to avoid).
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

  test("X25: all metrics come from a single scan of the table") {
    val plan = Profile.dataProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    val scans = "(?i)FileScan|BatchScan".r.findAllIn(plan).length
    assert(scans == 1,
      s"profiling must be one pass over the table, found $scans scans:\n$plan")
  }
}
