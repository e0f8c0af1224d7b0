package graft

import graft.ops.{Dedup, QualityDedup, Text}

/** X67 — quality canonical: clusters must agree with x18's labels,
  * every cluster keeps exactly one member, and that member is the
  * quality-argmax (ties to the smaller doc_id).
  */
class QualityDedupSpec extends SparkSpec {

  test("X67: one survivor per cluster — the quality argmax") {
    val clusters = Dedup.dupClusters(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val scores = Text.textQuality(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("quality_score")).toMap

    val got = QualityDedup.qualityCanonical(spark, sfDir).collect()
    assert(got.length == clusters.size)
    got.foreach { r =>
      assert(r.getLong(1) == clusters(r.getLong(0)),
        s"cluster label ${r.getLong(0)} agrees with x18")
      assert(java.lang.Double.compare(r.getDouble(3),
        scores(r.getLong(0))) == 0, s"score ${r.getLong(0)}")
    }

    val byCluster = got.groupBy(_.getLong(1))
    byCluster.foreach { case (c, members) =>
      assert(members.map(_.getLong(2)).toSet ==
        Set(members.length.toLong), s"cluster_size $c")
      val survivors = members.filter(_.getBoolean(4))
      assert(survivors.length == 1, s"exactly one survivor in $c")
      val best = members.map(m => (m.getLong(0), m.getDouble(3)))
        .minBy { case (id, s) => (-s, id) }
      assert(survivors.head.getLong(0) == best._1, s"argmax in $c")
      members.foreach(m => assert(
        m.getString(5) == (if (m.getBoolean(4)) "keep" else "drop")))
    }
    assert(byCluster.exists(_._2.length > 1),
      "fixture has at least one multi-member cluster")
  }

  test("X67: a multi-member cluster can keep a non-minimal doc_id") {
    // the policy must actually differ from x18's min-id convention
    // somewhere in the fixture OR every survivor coincides — assert the
    // mechanism, not the coincidence: survivors are argmax, and when the
    // argmax is not the min id, the min id is dropped
    val got = QualityDedup.qualityCanonical(spark, sfDir).collect()
    val multi = got.groupBy(_.getLong(1)).filter(_._2.length > 1)
    val divergent = multi.values.filter { ms =>
      val minId = ms.map(_.getLong(0)).min
      !ms.find(_.getLong(0) == minId).get.getBoolean(4)
    }
    divergent.foreach { ms =>
      val surv = ms.filter(_.getBoolean(4)).head
      val minRow = ms.minBy(_.getLong(0))
      assert(surv.getDouble(3) > minRow.getDouble(3),
        "a non-min survivor must strictly beat the min id on quality")
    }
  }
}
