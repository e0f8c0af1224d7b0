package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{KsDrift, Wasserstein}
import graft.stream.StreamDrift

/** X152 — streaming drift monitor: the streamed statistics must equal
  * the batch run of the same monitor over everything ingested so far
  * (across a micro-batch boundary, where the state store's reservoir
  * does the bottom-k merge), state must stay one bounded row per
  * source, identical distributions must report exactly zero drift, a
  * point-mass shift must report exactly (ks=1, w1=shift), and below
  * sketch capacity the estimates must be exact (checked against a
  * hand CDF).
  */
class StreamDriftSpec extends SparkSpec {

  import spark.implicits._

  private def docsDF(rows: Seq[(String, Long, Long)]) =
    rows.toDF("source", "doc_id", "n_chars")

  test("streamed drift equals batch drift across micro-batches; " +
    "state is one row per source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (first, second) = docs.splitAt(docs.length / 2)
    // reference = the same corpus with every length shifted +7 (a
    // deterministic drift every source must detect identically)
    val ref = StreamDrift.refSamples(
      docsDF(docs.toSeq.map { case (s, i, v) => (s, i, v + 7L) }))
      .cache()

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamDrift.driftMonitor(
        input.toDF().toDF("source", "doc_id", "n_chars"), ref)
      .writeStream.format("memory").queryName("x152_drift")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x152_drift").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamDrift.driftMonitor(docsDF(docs.toSeq), ref)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "incremental reservoir must make streamed ≡ batch on the " +
          "full stream")
      assert(streamed.nonEmpty)

      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }

  test("a source absent from the reference alarms instead of vanishing") {
    // round-13 advice item: the inner join dropped never-calibrated
    // sources — the strongest drift signal there is. The left join must
    // emit the row with the explicit no-reference convention.
    val ref = StreamDrift.refSamples(
      docsDF((1L to 20L).map(i => ("known", i, 10L))))
    val out = StreamDrift.driftMonitor(
        docsDF(Seq(("known", 1L, 10L), ("novel", 2L, 99L),
          ("novel", 3L, 42L))), ref)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.contains("novel"), "the novel source must emit a row")
    val n = out("novel")
    assert(!n.getAs[Boolean]("has_ref"))
    assert(n.getAs[Long]("n_ref") == 0L)
    assert(n.getAs[Long]("n_cur") == 2L)
    assert(n.getAs[Double]("ks_q") == 1.0,
      "a never-calibrated feed is maximal drift by convention")
    assert(n.getAs[Double]("w1_q") == 0.0)
    assert(out("known").getAs[Boolean]("has_ref") &&
      out("known").getAs[Double]("ks_q") == 0.0)
  }

  test("identical distributions report exactly zero drift") {
    val docs = (1L to 100L).map(i => ("s", i, 10L + i % 13))
    val ref = StreamDrift.refSamples(docsDF(docs))
    val r = StreamDrift.driftMonitor(docsDF(docs), ref).collect()(0)
    assert(r.getAs[Double]("ks_q") == 0.0)
    assert(r.getAs[Double]("w1_q") == 0.0)
  }

  test("a point mass shifted by d reports ks=1 and w1=d exactly") {
    val cur = (1L to 50L).map(i => ("s", i, 40L))
    val ref = StreamDrift.refSamples(
      docsDF((1L to 80L).map(i => ("s", i, 25L))))
    val r = StreamDrift.driftMonitor(docsDF(cur), ref).collect()(0)
    assert(r.getAs[Double]("ks_q") == 1.0,
      "disjoint point masses must have the full CDF gap")
    assert(r.getAs[Double]("w1_q") == 15.0,
      "earth-mover distance of a point mass shifted by 15 must be 15")
  }

  test("below capacity the estimates are the exact X117/X141 statistics " +
    "against the reference") {
    // both sides below K ⇒ the samples ARE the data, so ks_q/w1_q must
    // equal the exact two-sample statistics. X117/X141 compute
    // in-vs-rest over one corpus, so build the exact answer here from
    // the two-sample CDF definition on a hand distribution.
    val cur = docsDF(Seq(("s", 1L, 1L), ("s", 2L, 3L), ("s", 3L, 3L),
      ("s", 4L, 9L)))
    val refDocs = Seq(("s", 10L, 1L), ("s", 11L, 5L))
    // cur: {1, 3, 3, 9} (n=4), ref: {1, 5} (n=2); spine 1,3,5,9
    // scaled gaps |cnt_cur·2 − cnt_ref·4|: t=1: |2-4|=2; t=3: |6-4|=2;
    // t=5: |6-8|=2; t=9: |8-8|=0 → ks = 2/8 = 0.25
    // w1_num = (3-1)·2 + (5-3)·2 + (9-5)·2 = 16 → w1 = 16/8 = 2.0
    val ref = StreamDrift.refSamples(docsDF(refDocs))
    val r = StreamDrift.driftMonitor(cur, ref).collect()(0)
    assert(r.getAs[Long]("n_cur") == 4L && r.getAs[Long]("n_ref") == 2L)
    assert(r.getAs[Double]("ks_q") == 0.25)
    assert(r.getAs[Double]("w1_q") == 2.0)
    // and the same spine/gap conventions as the batch family: both
    // batch ops exist and answer on this corpus (compile-time tie)
    assert(KsDrift.queries.nonEmpty && Wasserstein.queries.nonEmpty)
  }
}
