package graft

import graft.ops.Packing

/** X26 — sequence packing: the two-phase distributed prefix sum must be
  * bit-equal to a sequential fold, and the plan must not contain the
  * single-task global window the operator exists to avoid.
  */
class PackingSpec extends SparkSpec {

  test("X26: the distributed prefix sum equals a sequential fold") {
    val rows = Packing.sequencePacking(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // independent oracle: fold the rows in doc_id order on the driver
    var running = 0L
    rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
      assert(r.getAs[Long]("start_offset") == running,
        s"doc ${r.getAs[Long]("doc_id")}: offset ${r.getAs[Long]("start_offset")} != $running")
      assert(r.getAs[Long]("pack_id") == running / Packing.PackCapacity)
      assert(r.getAs[Long]("offset_in_pack") == running % Packing.PackCapacity)
      running += r.getAs[Long]("n_tokens")
    }
    // packs are used in order and start at 0
    val packs = rows.map(_.getAs[Long]("pack_id")).distinct.sorted
    assert(packs.head == 0L && packs.toSeq == (packs.head to packs.last).toSeq)
  }

  test("X26: offsets are exact when range boundaries are sample-dependent") {
    // Regression for the round-5 driver hash mismatch: RangePartitioner
    // reservoir-samples its boundaries with an RDD-id-derived seed, so if
    // the range exchange is instantiated once per consuming branch (window
    // branch + both partials branches), the branches can disagree on which
    // partition a boundary doc lands in, and part_offset drifts. A corpus
    // large enough that the reservoir SUB-samples (3000 docs in one input
    // partition vs a ~240-row reservoir) makes boundary agreement across
    // independent samples essentially impossible — so this test fails
    // almost surely unless the ranged projection is materialized once.
    import spark.implicits._
    val docs = (0 until 3000)
      .map(i => (i.toLong, Seq.fill(1 + (i * 2654435761L % 97).toInt % 13)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .coalesce(1)
    (1 to 3).foreach { rep =>
      val rows = Packing.packingOf(docs, 64L).collect()
      var running = 0L
      rows.sortBy(_.getAs[Long]("doc_id")).foreach { r =>
        assert(r.getAs[Long]("start_offset") == running,
          s"rep $rep doc ${r.getAs[Long]("doc_id")}: " +
            s"${r.getAs[Long]("start_offset")} != $running")
        running += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("X26: the ranged projection is materialized once (single range shuffle)") {
    // Post-fix plan shape: the repartitionByRange runs at checkpoint time,
    // so the RESULT plan must contain exactly one RangePartitioning — the
    // oracle-determinism ORDER BY on the final output — and scan the
    // checkpointed RDD, not three independently-sampled range exchanges.
    val plan = Packing.sequencePacking(spark, sfDir)
      .queryExecution.executedPlan.toString
    val rangeExchanges = plan.linesIterator
      .count(l => l.contains("Exchange rangepartitioning"))
    assert(rangeExchanges == 1,
      s"expected only the final ORDER BY range exchange, got $rangeExchanges:\n$plan")
    assert(plan.contains("ExistingRDD") || plan.contains("Scan ExistingRDD"),
      s"expected the checkpointed ranged projection in the plan:\n$plan")
  }

  test("X26: no un-partitioned global window in the plan") {
    val plan = Packing.sequencePacking(spark, sfDir)
      .queryExecution.optimizedPlan.toString
    // the naive form plans `Window [...] windowspecdefinition(doc_id ...)`
    // with an EMPTY partition spec — every Window here must be keyed by
    // the physical partition id
    val windowLines = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowLines.nonEmpty, "expected the per-partition running-sum window")
    windowLines.foreach { l =>
      assert(l.contains("pid"),
        s"window without a partition key (single-task global sort):\n$l")
    }
  }
}
