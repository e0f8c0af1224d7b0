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

  test("X26: offsets are exact and repeatable on a single-split corpus") {
    // Regression for the round-5/6 driver hash mismatches: when `pid` came
    // from RangePartitioner (reservoir-sampled boundaries) via
    // spark_partition_id, independent instantiations of the range exchange
    // could disagree on boundary docs and drift part_offset. `pid` is now a
    // row-local function of doc_id, so repeated executions over a corpus
    // big enough to have forced boundary sub-sampling (3000 docs in one
    // input split) must produce the identical exact fold every time.
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

  test("X26: bucketing is row-local (only the final ORDER BY range-shuffles)") {
    // Post-round-6 shape: `pid` is a deterministic row-local function of
    // doc_id — no RangePartitioner anywhere except the oracle-determinism
    // ORDER BY on the final output, and no physical-partition artifact
    // (spark_partition_id) whose value could depend on execution.
    val df = Packing.sequencePacking(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    val rangeExchanges = plan.linesIterator
      .count(l => l.contains("Exchange rangepartitioning"))
    assert(rangeExchanges == 1,
      s"expected only the final ORDER BY range exchange, got $rangeExchanges:\n$plan")
    assert(!plan.contains("SPARK_PARTITION_ID") && !plan.contains("spark_partition_id"),
      s"pid must not derive from physical execution:\n$plan")
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
