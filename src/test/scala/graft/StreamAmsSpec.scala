package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.JoinSize
import graft.stream.StreamAms

/** X161 — streaming AMS maintenance: streamed ≡ batch BIT-equal across
  * a micro-batch boundary (the sketch is linear — plain SUM state),
  * one bounded state row per source, and the live join-vs-reference
  * estimate agrees with X159's batch inner product on the same
  * integers.
  */
class StreamAmsSpec extends SparkSpec {

  import spark.implicits._

  test("streamed AMS equals batch exactly; state is one row per source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val (first, second) = docs.splitAt(docs.length / 2)
    val ref = StreamAms.refSketch(
      docs.toSeq.toDF("grp", "v")).cache()

    val input = MemoryStream[(String, String)]
    val query = StreamAms.amsMonitor(
        input.toDF().toDF("grp", "v"), ref)
      .writeStream.format("memory").queryName("x161_ams")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x161_ams").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamAms.amsMonitor(docs.toSeq.toDF("grp", "v"), ref)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "a linear sketch must make streamed ≡ batch bit-equal")
      assert(streamed.nonEmpty)

      // the full stream IS the reference here, so the live-vs-reference
      // inner product is each source's own F2: est_join_ref == est_f2
      spark.table("x161_ams").collect().foreach { r =>
        assert(r.getAs[Long]("est_join_ref") == r.getAs[Long]("est_f2"),
          s"source ${r.get(0)}: self-reference must reproduce F2")
      }

      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }

  test("a source absent from the reference alarms instead of vanishing") {
    // round-13 advice item: the old stream-static INNER join silently
    // dropped any source without a calibration row — the novel feed a
    // monitor exists to catch. The left join must emit it flagged.
    val ref = StreamAms.refSketch(Seq(("known", "x")).toDF("grp", "v"))
    val out = StreamAms.amsMonitor(
        Seq(("known", "x"), ("novel", "y"), ("novel", "z"))
          .toDF("grp", "v"), ref)
      .collect().map(r => r.getAs[String]("grp") -> r).toMap
    assert(out.contains("novel"), "the novel source must emit a row")
    val n = out("novel")
    assert(!n.getAs[Boolean]("has_ref"))
    assert(n.getAs[Long]("ref_rows") == 0L)
    assert(n.getAs[Long]("n_rows") == 2L,
      "the live F2 side must still be maintained for a novel source")
    assert(n.isNullAt(n.fieldIndex("est_join_ref")),
      "no reference sketch ⇒ no overlap estimate (NULL, not fake 0)")
    val k = out("known")
    assert(k.getAs[Boolean]("has_ref") &&
      k.getAs[Long]("ref_rows") == 1L &&
      !k.isNullAt(k.fieldIndex("est_join_ref")))
  }

  test("the live cross estimate is X159's inner product on the same integers") {
    // two sources, reference = source b's rows only; the monitor's
    // est_join_ref for source a must equal X159's batch pair estimate
    val rows = (Seq.fill(3)(("a", "dup")) ++ Seq.fill(5)(("b", "dup")))
      .toDF("grp", "v")
    val ref = StreamAms.refSketch(
      Seq.fill(5)(("a", "dup")).toDF("grp", "v"))
    // note: refSketch keys by grp — rename b's sketch onto a's key so
    // the stream-static join pairs a-with-b
    val out = StreamAms.amsMonitor(
        Seq.fill(3)(("a", "dup")).toDF("grp", "v"), ref)
      .collect()(0)
    assert(out.getAs[Long]("est_join_ref") ==
      JoinSize.joinSizeOf(rows).collect()(0).getAs[Long]("est_join") * 1L)
    assert(out.getAs[Long]("est_join_ref") == 15L)
  }
}
