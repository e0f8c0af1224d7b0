package graft

import graft.ops.Compaction

/** B47 — compaction plan: bins must equal a driver-side greedy
  * first-fit recompute over the per-(type, day) inventory, stay
  * contiguous in day order with consecutive ids, and the running-sum
  * window must stay partitioned (no global funnel).
  */
class CompactionSpec extends SparkSpec {

  private def inventory(): Map[String, Seq[(java.sql.Date, Long, Long)]] =
    Tables.events(spark, sfDir)
      .selectExpr("event_type", "to_date(ts) AS d",
        "CAST(octet_length(props) AS BIGINT) AS b")
      .collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues { xs =>
        xs.groupBy(_._2).toSeq
          .map { case (d, rows) =>
            (d, rows.map(_._3).sum, rows.size.toLong) }
          .sortBy(_._1.getTime)
      }.toMap

  test("B47: bins equal driver-side greedy first-fit recompute") {
    val expected = inventory().toSeq.flatMap { case (t, files) =>
      var off = 0L
      files.map { case (d, bytes, rows) =>
        val bin = off / Compaction.targetBytes
        off += bytes
        ((t, bin), (d, bytes, rows))
      }
    }.groupBy(_._1).view.mapValues { xs =>
      val fs = xs.map(_._2).toSeq
      (fs.size.toLong, fs.map(_._2).sum, fs.map(_._3).sum,
        fs.map(_._1.getTime).min, fs.map(_._1.getTime).max)
    }.toMap

    val got = Compaction.compactionPlan(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(expected(k) == ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDate(5).getTime, r.getDate(6).getTime)), k.toString)
    }
  }

  test("B47: bins are contiguous day ranges with consecutive ids") {
    val byType = Compaction.compactionPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getDate(5).getTime, r.getDate(6).getTime))
      .groupBy(_._1)
    byType.foreach { case (t, bins) =>
      val sorted = bins.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq,
        s"$t: bin ids consecutive from 0")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 < b._3, s"$t: bin ${a._2} day range precedes ${b._2}")
        case _ =>
      }
    }
  }

  test("B47: plan — the running sum windows over the partition key") {
    val df = Compaction.compactionPlan(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Exchange SinglePartition"),
      "no global window funnel")
    val windows = "(?m)^.*Window .*$".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty &&
      windows.forall(_.contains("event_type")), windows.mkString("\n"))
  }
}
