package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.SeqAssembly
import graft.stream.StreamSessions

/** X101 — streaming session assembly: the keyed-state operator must
  * emit exactly the batch X93 samples for event-time-ordered ingestion
  * — sessions straddling micro-batches close from state, and the final
  * open session per user closes on the terminal watermark advance.
  */
class StreamSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def sessionsOf(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("session_id"),
      r.getAs[Long]("n_events"), r.getAs[Long]("n_types"),
      r.getAs[String]("seq"))).toSet

  test("stream sessions equal batch X93, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_type", "event_id")
      .orderBy("ts", "event_id").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2), r.getLong(3)))
    val expected = sessionsOf(SeqAssembly.sessionSequencesOf(
      events.toSeq.toDF("user_id", "ts", "event_type", "event_id"))
      .collect().toSeq)
    assert(expected.exists(_._2 > 1L), "corpus must contain multi-session users")

    // split mid-corpus so many open sessions straddle the batch boundary;
    // a terminal far-future event on a sacrificial user advances the
    // watermark past every horizon so the last open sessions flush
    val (first, second) = events.splitAt(events.length / 2)
    val flushUser = -1L
    val flushTs = new Timestamp(events.last._2.getTime + 24L * 3600 * 1000)
    val input = MemoryStream[(Long, Timestamp, String, Long)]
    val query = StreamSessions.closedSessions(
      input.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      val afterFirst = spark.table("stream_sessions").count()
      input.addData(second.toSeq)
      query.processAllAvailable()
      // two terminal batches: the first carries the flush event (advancing
      // the watermark as a SIDE effect for the next batch), the second
      // lets every timed-out session emit under the advanced watermark
      input.addData(Seq((flushUser, flushTs, "view", 999999999L)))
      query.processAllAvailable()
      input.addData(Seq((flushUser, new Timestamp(flushTs.getTime + 1000),
        "view", 999999998L)))
      query.processAllAvailable()
      val got = sessionsOf(spark.table("stream_sessions").collect().toSeq
        .filter(_.getAs[Long]("user_id") != flushUser))
      assert(got == expected,
        s"missing=${(expected -- got).take(5)}\nspurious=${(got -- expected).take(5)}")
      assert(afterFirst < expected.size,
        "split must leave sessions to close from state in later batches")
    } finally query.stop()
  }

  test("a session straddling the gap emits exactly once, in order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)
    val input = MemoryStream[(Long, Timestamp, String, Long)]
    val query = StreamSessions.closedSessions(
      input.toDF().toDF("user_id", "ts", "event_type", "event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_sessions_2").start()
    try {
      // session 1: two events 5 min apart; session 2 opens 40 min later
      input.addData(Seq((7L, ts(0), "view", 1L), (7L, ts(5), "click", 2L)))
      query.processAllAvailable()
      assert(spark.table("stream_sessions_2").count() == 0,
        "open session must not emit early")
      input.addData(Seq((7L, ts(45), "purchase", 3L)))
      query.processAllAvailable()
      val got = sessionsOf(spark.table("stream_sessions_2").collect().toSeq)
      assert(got == Set((7L, 1L, 2L, 2L, "view>click")))
    } finally query.stop()
  }
}
