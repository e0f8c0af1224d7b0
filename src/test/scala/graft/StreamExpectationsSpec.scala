package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Expectations
import graft.stream.StreamExpectations

/** X150 — incrementally-maintained contract monitor: streamed ≡ batch
  * across a micro-batch boundary, the five exact violation counts
  * agree with X149's batch audit on the same data, duplicate volume is
  * sketch-exact below capacity, and state is one row total.
  */
class StreamExpectationsSpec extends SparkSpec {

  import spark.implicits._

  test("streaming monitor equals batch and X149 across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"n_chars", $"text", $"source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(Long, String, Long, String, String)]
    val query = StreamExpectations.expectationsMonitor(
        input.toDF().toDF("doc_id", "lang", "n_chars", "text", "source"))
      .writeStream.format("memory").queryName("x150_monitor")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x150_monitor").collect()
      assert(streamed.length == 1)
      val batch = StreamExpectations.expectationsMonitor(
        docs.toSeq.toDF("doc_id", "lang", "n_chars", "text", "source"))
        .collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
        "incremental monitor must equal the batch monitor of the stream")

      // the five exact contracts agree with X149's batch audit
      val audit = Expectations.expectationsAudit(spark, sfDir).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
      val s = streamed(0)
      assert(s.getAs[Long]("v_null_id") == audit("doc_id_not_null"))
      assert(s.getAs[Long]("v_lang") == audit("lang_in_domain"))
      assert(s.getAs[Long]("v_chars") == audit("n_chars_positive"))
      assert(s.getAs[Long]("v_text") == audit("text_nonempty"))
      assert(s.getAs[Long]("v_src") == audit("source_format"))

      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"expected 1 state row, got $stateRows")
    } finally query.stop()
  }

  test("duplicate volume is sketch-exact below capacity") {
    val rows = ((1L to 40L) ++ (1L to 10L)) // 10 duplicate ids
      .map(i => (i, "en", 10L, s"text $i", "src1"))
      .toDF("doc_id", "lang", "n_chars", "text", "source")
    val r = StreamExpectations.expectationsMonitor(rows).collect()(0)
    assert(r.getAs[Long]("n_rows") == 50L)
    assert(r.getAs[Long]("k_used") == 40L)
    assert(r.getAs[Double]("est_ids") == 40.0)
    assert(r.getAs[Double]("est_dups") == 10.0,
      "below capacity the duplicate estimate must be exact")
  }
}
