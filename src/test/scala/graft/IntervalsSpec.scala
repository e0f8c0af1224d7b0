package graft

import graft.ops.Intervals

/** B40 — bucketed interval-overlap join: the banded plan must equal the
  * brute-force theta join exactly (the bucketing is an execution
  * strategy, not an approximation), emit each pair once, and never plan
  * a cartesian product.
  */
class IntervalsSpec extends SparkSpec {

  private def pairs() = Intervals.overlapPairs(Tables.events(spark, sfDir))

  test("B40: bucketed candidates equal the brute-force theta join") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
    val a = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("us")).as("a_lo"), max(col("us")).as("a_hi"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("a_lo"), r.getAs[Long]("a_hi")))
    val b = ev.groupBy(col("event_type"), expr("us div 3600000000").as("hour_id"))
      .agg(min(col("us")).as("b_lo"), max(col("us")).as("b_hi"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("hour_id"),
        r.getAs[Long]("b_lo"), r.getAs[Long]("b_hi")))
    val brute = (for {
      (uid, day, alo, ahi) <- a
      (et, hid, blo, bhi) <- b
      if alo <= bhi && blo <= ahi
    } yield (uid, day, et, hid)).toSet

    val got = pairs().collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("event_type"), r.getAs[Long]("hour_id")))
    assert(brute.nonEmpty, "fixture must produce overlapping pairs")
    assert(got.length == got.toSet.size,
      "emit-in-first-shared-bucket must yield each pair exactly once")
    assert(got.toSet == brute,
      "bucketed join must equal the quadratic theta join")
  }

  test("B40: bucket fan-out is bounded by interval length / bucket width") {
    import org.apache.spark.sql.functions._
    // a daily window spans at most ceil(24h / 6h) + 1 = 5 buckets
    val maxSpan = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"),
        unix_micros(col("ts")).as("us"))
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(col("us")).as("lo"), max(col("us")).as("hi"))
      .select(expr(s"hi div ${Intervals.BucketUs}L - lo div ${Intervals.BucketUs}L + 1").as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(maxSpan <= 5, s"daily purchase window exploded into $maxSpan buckets")
  }

  test("B40: plan is a bucket equi-join — no cartesian, no nested loop") {
    val df = pairs()
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"theta join must be rewritten to the bucket equi-join:\n$plan")
  }
}
