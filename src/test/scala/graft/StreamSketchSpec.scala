package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.functions.CountMin
import graft.stream.StreamSketch

/** X47 — streaming CMS: the incrementally-maintained sketch must equal
  * the batch sketch of everything ingested so far — including across a
  * micro-batch boundary — and its state store must hold exactly one
  * row regardless of key cardinality.
  */
class StreamSketchSpec extends SparkSpec {

  test("streaming sketch equals the batch sketch across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val users = Tables.events(spark, sfDir)
      .select($"user_id").collect().map(_.getLong(0))
    val (first, second) = users.splitAt(users.length / 2)

    val input = MemoryStream[Long]
    val query = StreamSketch.userSketch(input.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("x47_sketch")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x47_sketch")
        .collect()(0).getSeq[Long](0)
      val batch = StreamSketch.userSketch(
        users.toSeq.toDF("user_id")).collect()(0).getSeq[Long](0)
      assert(streamed == batch,
        "incremental sketch must equal the batch sketch of the full stream")
      assert(streamed.sum == users.length.toLong * CountMin.Depth)

      // constant state: one global buffer row, not per-key state
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == 1L, s"expected 1 state row, got $stateRows")
    } finally query.stop()
  }
}
