package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, SplitLeakage}

/** X61 — split + leakage audit: the split must be a deterministic
  * row-local function of doc_id (pinned against an independent JVM md5
  * recompute), fractions must be ~80/10/10, and the leakage matrix must
  * equal driver-side set arithmetic over the X2 pair set.
  */
class SplitLeakageSpec extends SparkSpec {

  /** Independent JVM recompute of splitOf: md5 digest bytes 8..12
    * little-endian (= md5Long40) mod 100, bucketed 80/10/10. */
  private def splitOfJvm(docId: Long): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"split|$docId".getBytes("UTF-8"))
    val h40 = (8 to 12).foldRight(0L)((i, acc) =>
      (acc << 8) | (d(i) & 0xffL))
    val b = h40 % 100
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("X61: split is the pinned md5 function of doc_id, ~80/10/10") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("doc_id")
    val got = ids.select($"doc_id",
        SplitLeakage.splitOf($"doc_id").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got.size == 2000)
    got.foreach { case (id, s) => assert(s == splitOfJvm(id), s"doc $id") }
    val frac = got.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(frac("train") > 1500 && frac("train") < 1700, frac.toString)
    assert(frac("val") > 120 && frac("val") < 280, frac.toString)
    assert(frac("test") > 120 && frac("test") < 280, frac.toString)
    // partition-invariant by construction: same assignment at any layout
    val re = ids.repartition(7).select($"doc_id",
        SplitLeakage.splitOf($"doc_id").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(re == got)
  }

  test("X61: leakage matrix equals driver-side recompute from X2 pairs") {
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    val expected = pairs
      .map { case (a, b) =>
        val (sa, sb) = (splitOfJvm(a), splitOfJvm(b))
        ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa), (a, b))
      }
      .groupBy(_._1).view.mapValues { xs =>
        (xs.size.toLong,
          xs.flatMap { case (_, (a, b)) => Seq(a, b) }.distinct.size.toLong)
      }.toMap

    val got = SplitLeakage.splitLeakage(spark, sfDir).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet ==
      expected.keySet)
    got.foreach { r =>
      val k = (r.getString(0), r.getString(1))
      assert((r.getLong(2), r.getLong(3)) == expected(k), k.toString)
      assert(r.getBoolean(4) == (k._1 != k._2), k.toString)
    }
  }

  test("X61: plan — split derivation is map-side, no cartesian") {
    val df = SplitLeakage.splitLeakage(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"))
    // no join keyed on a doc->split lookup: the only join mentioning the
    // split columns is the ≤6-row matrix merge of the two aggregates
    val joinsOnSplit = "(?m)^.*Join.*split_a.*$".r.findAllIn(plan).length
    assert(joinsOnSplit <= 1, s"split joins: $joinsOnSplit\n$plan")
  }
}
