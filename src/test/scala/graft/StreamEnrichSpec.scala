package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.stream.StreamEnrich

/** X57 — stream-static enrichment: row-level batch == stream parity
  * across micro-batch boundaries, boundary-exact flagging (fences are
  * inclusive), unknown types tagged not dropped, and a stateless
  * broadcast plan (no state store, no shuffle of the stream side).
  */
class StreamEnrichSpec extends SparkSpec {

  private def fences = {
    import spark.implicits._
    Seq(("click", 10.0, 20.0), ("view", 0.0, 5.0))
      .toDF("event_type", "lo", "hi")
  }

  private val events = Seq(
    (1L, "click", 9.99),   // below
    (2L, "click", 10.0),   // ok — fences inclusive
    (3L, "click", 20.0),   // ok — fences inclusive
    (4L, "click", 20.01),  // above
    (5L, "view", 3.0),     // ok
    (6L, "purchase", 99.0) // unfenced — no fence row
  )

  test("X57: stream output equals the batch join, across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val q = StreamEnrich.enrich(
      input.toDF().toDF("event_id", "event_type", "value"), fences)
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(events.take(3))
      q.processAllAvailable()
      input.addData(events.drop(3)) // second micro-batch
      q.processAllAvailable()
      val streamed = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("flag"))).toMap
      val batch = StreamEnrich.enrich(
        events.toDF("event_id", "event_type", "value"), fences)
        .collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[String]("flag"))).toMap
      assert(streamed == batch, "stream and batch must agree row-for-row")
      assert(batch == Map(1L -> "below", 2L -> "ok", 3L -> "ok",
        4L -> "above", 5L -> "ok", 6L -> "unfenced"))
    } finally q.stop()
  }

  test("X57: stateless broadcast plan — no state store, no stream shuffle") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Double)]
    val q = StreamEnrich.enrich(
      input.toDF().toDF("event_id", "event_type", "value"), fences)
      .writeStream.format("memory").queryName("enriched_plan")
      .outputMode("append").start()
    try {
      input.addData(events)
      q.processAllAvailable()
      val plan = q.asInstanceOf[
          org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"static side must broadcast:\n$plan")
      assert(!plan.contains("StateStore"),
        s"stream-static join must hold NO state:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"the stream side must not shuffle:\n$plan")
      assert(q.lastProgress.stateOperators.isEmpty ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
        "no state store rows for a stream-static join")
    } finally q.stop()
  }
}
