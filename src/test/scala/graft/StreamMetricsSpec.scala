package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamMetrics

/** X88 — streaming keyed metrics: the incrementally-maintained table
  * must equal the batch recompute of everything ingested so far —
  * including across a micro-batch boundary — and state must be one row
  * per key (a summary, never an event buffer).
  */
class StreamMetricsSpec extends SparkSpec {

  test("streaming metrics equal the batch recompute across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type", $"value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    val (first, second) = rows.splitAt(rows.length / 2)

    val input = MemoryStream[(Long, String, Double)]
    val query = StreamMetrics.keyedMetrics(
        input.toDF().toDF("user_id", "event_type", "value"))
      .writeStream.format("memory").queryName("x88_metrics")
      .outputMode("complete").start()
    try {
      input.addData(first)
      query.processAllAvailable()
      input.addData(second)
      query.processAllAvailable()

      val streamed = spark.table("x88_metrics").collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      val batch = StreamMetrics.keyedMetrics(
          rows.toDF("user_id", "event_type", "value")).collect()
        .map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
        .toMap
      // bit-equal per key: counts/decimal totals merge exactly across
      // the micro-batch boundary; the mean divides the same operands
      assert(streamed == batch,
        "incremental metrics must equal the batch recompute")

      // state is the keyed summary: one row per distinct key
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == batch.size.toLong,
        s"expected ${batch.size} state rows, got $stateRows")
    } finally query.stop()
  }
}
