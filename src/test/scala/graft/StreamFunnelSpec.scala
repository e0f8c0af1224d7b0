package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Funnel
import graft.stream.StreamFunnel

/** X41 — streaming funnel: the incremental keyed-state operator must
  * emit exactly the batch stage-completion times ([[Funnel.stageTimes]])
  * for event-time-ordered ingestion, including conversions that
  * straddle micro-batches, and its state must stay constant-size per
  * user.
  */
class StreamFunnelSpec extends SparkSpec {

  test("stream completions equal batch stage times, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_type", "event_id")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
    // batch reference: per-user t1/t2/t3 from the window definition
    val batch = Funnel.stageTimes(
      events.toSeq.toDF("user_id", "ts", "event_type", "event_id"),
      Funnel.StepHours).collect()
    val expected = batch.flatMap { r =>
      Seq("t1" -> "1_view", "t2" -> "2_click", "t3" -> "3_purchase").flatMap {
        case (c, stage) => Option(r.getAs[Timestamp](c))
          .map(ts => (r.getAs[Long]("user_id"), stage, ts))
      }
    }.toSet
    assert(expected.exists(_._2 == "3_purchase"),
      "corpus must contain full conversions")

    // time-ordered split chosen to STRADDLE a conversion: cut right
    // after some converting user's first view, so their click/purchase
    // arrive in the second micro-batch and must complete from state
    val converter = expected.collect { case (u, "2_click", _) => u }.head
    val viewTs = expected.collect { case (`converter`, "1_view", ts) => ts }.head
    val cut = events.indexWhere(e =>
      e._1 == converter && e._3 == "view" && e._2 == viewTs) + 1
    val (first, second) = events.splitAt(cut)
    val input = MemoryStream[(Long, Timestamp, String, Long)]
    val query = StreamFunnel.stageCompletions(
      input.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_funnel").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      val afterFirst = spark.table("stream_funnel").count()
      input.addData(second.toSeq)
      query.processAllAvailable()
      val got = spark.table("stream_funnel").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("stage"),
          r.getAs[Timestamp]("ts"))).toSet
      assert(got == expected,
        s"missing=${expected -- got}\nspurious=${got -- expected}")
      assert(afterFirst < expected.size,
        "split must leave some completions to the second micro-batch")
      // every emission is unique: a stage completes at most once per user
      assert(got.size == spark.table("stream_funnel").count())
    } finally query.stop()
  }

  test("state is three timestamps per user — never an event buffer") {
    // structural pin: FunnelState holds exactly the stage timestamps, so
    // a hot user costs what a cold one does
    val fields = classOf[StreamFunnel.FunnelState].getDeclaredFields
      .filterNot(_.isSynthetic).map(_.getName).toSet
    assert(fields == Set("t1", "t2", "t3"))
  }
}
