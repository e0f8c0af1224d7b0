package graft

import graft.ops.EmbedProfile

/** X64 — embedding profile: per-dim moments must equal a driver-side
  * exact recompute, be bit-identical under any partition layout (i64
  * sums commute), and aggregate map-side before the dim shuffle.
  */
class EmbedProfileSpec extends SparkSpec {

  test("X64: moments equal driver-side exact recompute") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val got = EmbedProfile.embedProfile(spark, sfDir).collect()
    assert(got.length == dims)

    got.foreach { r =>
      val d = r.getLong(0).toInt
      val xs = vecs.map(v => v(d).toDouble)
      val qs = xs.map(x => math.floor(x * 1e6).toLong)
      assert(r.getLong(1) == xs.length.toLong, s"n dim $d")
      assert(r.getLong(2) == qs.count(_ == 0L).toLong, s"n_zero dim $d")
      val n = xs.length.toLong
      val sumQ = qs.sum
      val sumSq = qs.map(q => BigInt(q) * BigInt(q)).sum
      val mean = sumQ.toDouble / (n.toDouble * 1e6)
      val varV = (BigInt(n) * sumSq - BigInt(sumQ) * BigInt(sumQ)).toDouble /
        (n.toDouble * n.toDouble * 1e6 * 1e6)
      assert(java.lang.Double.compare(r.getDouble(3), mean) == 0,
        s"mean dim $d")
      assert(java.lang.Double.compare(r.getDouble(4), varV) == 0,
        s"var dim $d")
      assert(r.getDouble(5) == xs.min && r.getDouble(6) == xs.max,
        s"range dim $d")
      assert(r.getDouble(4) >= 0.0, s"variance nonnegative dim $d")
    }
  }

  test("X64: partition-invariant — repartition(7) gives identical bits") {
    val base = EmbedProfile.embedProfile(spark, sfDir).collect()
    val got = EmbedProfile.profileOf(
      Tables.embeddings(spark, sfDir).repartition(7)).collect()
    assert(got.map(_.toString).toSeq == base.map(_.toString).toSeq)
  }

  test("X64: plan — map-side partial aggregate, no window, one dim shuffle") {
    val df = EmbedProfile.embedProfile(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Window"), "no window")
    assert("HashAggregate|SortAggregate".r.findAllIn(plan).nonEmpty)
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx <= 1, s"one dim shuffle, got $hashEx\n$plan")
  }
}
