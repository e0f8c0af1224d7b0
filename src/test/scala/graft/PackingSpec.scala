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
