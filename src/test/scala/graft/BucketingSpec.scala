package graft


/** The storage-side half of the shuffle story: tables bucketed on the
  * join key join WITHOUT any exchange — the plan proof that
  * pre-partitioned layout eliminates the big-table shuffle entirely
  * (on a cluster this is the difference between a co-located join and
  * shuffling 100 TB).
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with zero exchanges") {
    // warehouse dir is the static conf -Dspark.sql.warehouse.dir
    // (/tmp/graft-warehouse, set in build.sbt javaOptions)
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    // disable broadcast for this test: at testdata scale the planner
    // rightly prefers broadcasting the small side (and skips bucketing);
    // the point here is the big-big co-located SMJ shape
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          spark.table("li_bucketed")("l_orderkey") ===
            spark.table("ord_bucketed")("o_orderkey"))
      // execute, then read the final adaptive plan
      joined.queryExecution.executedPlan.execute().foreach(_ => ())
      val plan = joined.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case p => p.toString
      }
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount") || plan.contains("Bucketed: true"),
        s"scan did not use bucketing:\n$plan")
      // same answer as the unbucketed join
      val li = Tables.lineitem(spark, sfDir)
      val ord = Tables.orders(spark, sfDir)
      val expected = li.join(ord, li("l_orderkey") === ord("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
    }
  }
}
