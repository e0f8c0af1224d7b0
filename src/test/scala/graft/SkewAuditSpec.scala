package graft

import graft.ops.SkewAudit

/** B49 — partition-skew audit: buckets must equal an independent JVM
  * recompute of the portable hash, loads must sum to the table size,
  * and the plan must be aggregate + one-row broadcast (no window).
  */
class SkewAuditSpec extends SparkSpec {

  private def bucketJvm(userId: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"pb|$userId".getBytes("UTF-8"))
    val h40 = (8 to 12).foldRight(0L)((i, acc) => (acc << 8) | (d(i) & 0xffL))
    h40 % 32
  }

  test("B49: bucket loads equal the JVM hash recompute and sum to |events|") {
    val users = Tables.events(spark, sfDir)
      .select("user_id").collect().map(_.getLong(0))
    val expected = users.map(bucketJvm).groupBy(identity)
      .view.mapValues(_.length.toLong).toMap
    val total = users.length.toLong

    val got = SkewAudit.partitionSkew(spark, sfDir).collect()
    assert(got.map(_.getLong(1)).sum == total)
    got.foreach { r =>
      val b = r.getLong(0)
      assert(r.getLong(1) == expected(b), s"bucket $b")
      assert(java.lang.Double.compare(r.getDouble(2),
        expected(b).toDouble / total) == 0, s"share $b")
      assert(java.lang.Double.compare(r.getDouble(3),
        (expected(b) * 32).toDouble / total) == 0, s"ratio $b")
    }
    assert(got.map(_.getLong(0)).toSet == expected.keySet)
  }

  test("B49: plan — two-phase count + one-row broadcast, no window") {
    val df = SkewAudit.partitionSkew(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Window"))
    assert(plan.contains("BroadcastExchange"), "total rides a broadcast")
    assert(!plan.contains("CartesianProduct"))
  }
}
