package graft

import org.apache.spark.sql.functions._

/** Runtime bloom-filter injection (InjectRuntimeFilter): on a selective
  * fact-fact join, Catalyst builds a bloom filter from the filtered
  * (creation) side and pushes `might_contain` onto the other side's
  * scan — rows that cannot join die before the shuffle. At 100 TB this
  * is the difference between shuffling the whole probe fact and
  * shuffling the ~selectivity fraction that can match; the engine gets
  * it from configuration alone, which is why the suite pins the
  * capability rather than wrapping it in an operator.
  *
  * Thresholds are lowered only inside this spec — testdata is far below
  * the production defaults (10 MB creation-side limit).
  */
class RuntimeFilterSpec extends SparkSpec {

  import spark.implicits._

  test("selective fact-fact join gets a bloom runtime filter") {
    val conf = spark.conf
    val prev = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtimeFilter.number.threshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k =>
      k -> scala.util.Try(conf.get(k)).toOption.filter(_ != null))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "10GB")
      // testdata scans are KBs; production default (10 GB probe-side
      // floor) exists to avoid wasting a bloom build on small probes
      conf.set("spark.sql.optimizer.runtime.bloomFilter" +
        ".applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.optimizer.runtimeFilter.number.threshold", "10")
      // force a shuffle join: a broadcast join already prunes its probe
      // side and never needs (or gets) a bloom filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val li = Tables.lineitem(spark, sfDir)
        .select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, sfDir)
        .where($"o_totalprice" > 300000.0) // selective creation side
        .select("o_orderkey", "o_totalprice")
      val joined = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_orderkey").agg(sum($"l_quantity").as("q"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
        optimized.contains("bloom_filter_agg"),
        s"bloom runtime filter injected:\n$optimized")
      assert(joined.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
