package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Cusum
import graft.stream.StreamCusum

/** X111 — streaming CUSUM: the keyed-state recursion must emit exactly
  * the batch X94 chart over each user's active span for event-time-
  * ordered ingestion (days straddling micro-batches close from state;
  * the last open day closes on the terminal watermark advance), plus
  * crafted accumulation/clamp/silent-decay fixtures.
  */
class StreamCusumSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
      r.getAs[Long]("cnt"), r.getAs[Long]("cusum"),
      r.getAs[Boolean]("flagged"))).toSet

  private def runStream(name: String,
      batches: Seq[Seq[(Long, Timestamp)]]): Set[(Long, String, Long, Long, Boolean)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val query = StreamCusum.chartRows(
      input.toDF().toDF("user_id", "ts"))
      .writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); query.processAllAvailable() }
      rowsOf(spark.table(name).collect().toSeq)
    } finally query.stop()
  }

  private def ts(day: String, h: Int = 12): Timestamp =
    Timestamp.valueOf(s"$day ${f"$h%02d"}:00:00")

  test("X111: accumulation, clamp at zero, and threshold flag") {
    // day 1: 5 events → S = max(0, 0 + 5-3) = 2; day 2: 7 → S = 6 (flag);
    // day 3: 1 → S = 4; flush closes day 3
    val d1 = Seq.fill(5)((1L, ts("2024-01-01")))
    val d2 = Seq.fill(7)((1L, ts("2024-01-02")))
    val d3 = Seq((1L, ts("2024-01-03")))
    val flush = Seq((99L, ts("2024-02-01")), (99L, ts("2024-02-02")))
    val got = runStream("sc_acc", Seq(d1 ++ d2 ++ d3) ++ flush.map(Seq(_)))
      .filter(_._1 == 1L)
    assert(got == Set(
      (1L, "2024-01-01", 5L, 2L, false),
      (1L, "2024-01-02", 7L, 6L, true),
      (1L, "2024-01-03", 1L, 4L, false)))
  }

  test("X111: silent days decay the chart and emit their rows") {
    // day 1: 8 → S = 5 (flag); days 2-3 silent → 2, 0; day 4: 4 → 1
    val got = runStream("sc_decay", Seq(
      Seq.fill(8)((2L, ts("2024-01-01"))),
      Seq.fill(4)((2L, ts("2024-01-04"))),
      Seq((99L, ts("2024-02-01"))), Seq((99L, ts("2024-02-02")))))
      .filter(_._1 == 2L)
    assert(got == Set(
      (2L, "2024-01-01", 8L, 5L, true),
      (2L, "2024-01-02", 0L, 2L, false),
      (2L, "2024-01-03", 0L, 0L, false),
      (2L, "2024-01-04", 4L, 1L, false)))
  }

  test("X111: a day straddling micro-batches closes exactly once") {
    // day 1 split across two batches (3 + 2 events) then day 2 closes it
    val got = runStream("sc_straddle", Seq(
      Seq.fill(3)((3L, ts("2024-01-01", 8))),
      Seq.fill(2)((3L, ts("2024-01-01", 20))),
      Seq.fill(3)((3L, ts("2024-01-02"))),
      Seq((99L, ts("2024-02-01"))), Seq((99L, ts("2024-02-02")))))
      .filter(_._1 == 3L)
    assert(got == Set(
      (3L, "2024-01-01", 5L, 2L, false),
      (3L, "2024-01-02", 3L, 2L, false)))
  }

  test("X111: real corpus equals the batch X94 chart on active spans") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts").orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)))
    // batch chart, restricted per user to [first, last] active day —
    // outside the span the stream has nothing to close (leading silent
    // days hold S = 0 in batch, so span values agree; trailing decay
    // rows exist only in the fixed batch spine)
    val chart = Cusum.dailyChartOf(
      events.toSeq.toDF("user_id", "ts")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("cnt"), r.getAs[Long]("cusum")))
    val span = events.groupBy(_._1).view.mapValues { es =>
      val days = es.map(e => e._2.getTime / 86400000L)
      (days.min, days.max)
    }.toMap
    val expected = chart.filter { case (u, day, _, _) =>
      val d = java.time.LocalDate.parse(day).toEpochDay
      val (lo, hi) = span(u); d >= lo && d <= hi
    }.map { case (u, day, cnt, s) => (u, day, cnt, s, s >= Cusum.H) }.toSet

    val flushTs = new Timestamp(events.last._2.getTime + 40L * 86400000L)
    val (first, second) = events.splitAt(events.length / 2)
    val got = runStream("sc_corpus", Seq(
      first.toSeq, second.toSeq,
      Seq((-1L, flushTs)),
      Seq((-1L, new Timestamp(flushTs.getTime + 1000)))))
      .filter(_._1 != -1L)
    assert(got == expected,
      s"missing=${(expected -- got).take(5)}\nspurious=${(got -- expected).take(5)}")
    assert(expected.exists(_._5), "corpus must flag at least one user-day")
  }
}
