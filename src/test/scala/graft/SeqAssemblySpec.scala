package graft

import java.sql.Timestamp

import graft.ops.SeqAssembly

/** X93 — session sequence assembly: crafted boundary/order fixtures,
  * input-order independence (the array_sort discipline), and a full
  * driver-side replay on the real events.
  */
class SeqAssemblySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val fixture = Seq(
    // user 1, session 1: three events inside 30 min
    (1L, 10L, ts("2024-01-01 10:00:00"), "view"),
    (1L, 11L, ts("2024-01-01 10:10:00"), "click"),
    (1L, 12L, ts("2024-01-01 10:39:59"), "buy"),
    // user 1, session 2: exactly 30 min after the last → new session
    (1L, 13L, ts("2024-01-01 11:09:59"), "view"),
    // user 2: same-timestamp events order by event_id
    (2L, 20L, ts("2024-01-02 09:00:00"), "b"),
    (2L, 21L, ts("2024-01-02 09:00:00"), "a"))

  test("X93: gap boundary, in-session order, event_id tie-break") {
    val got = SeqAssembly.sessionSequencesOf(
      fixture.toDF("user_id", "event_id", "ts", "event_type"))
      .select($"user_id", $"session_id", $"n_events", $"n_types", $"seq")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 3L, 3L, "view>click>buy"),
      (1L, 2L, 1L, 1L, "view"),
      (2L, 1L, 2L, 2L, "b>a")))
  }

  test("X93: result is independent of input row order") {
    val fwd = SeqAssembly.sessionSequencesOf(
      fixture.toDF("user_id", "event_id", "ts", "event_type")).collect().toSeq
    val rev = SeqAssembly.sessionSequencesOf(
      fixture.reverse.toDF("user_id", "event_id", "ts", "event_type")
        .repartition(3)).collect().toSeq
    assert(fwd == rev)
  }

  test("X93: real events equal an independent driver-side replay") {
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .as[(Long, Long, Timestamp, String)].collect()
    def us(t: Timestamp): Long = // full µs precision (getTime drops sub-ms)
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    val expected = rows.groupBy(_._1).toSeq.flatMap { case (uid, es) =>
      val sorted = es.sortBy(e => (us(e._3), e._2))
      val sessions = sorted.foldLeft(Vector.empty[Vector[(Long, Long, Timestamp, String)]]) {
        case (acc, e) =>
          if (acc.isEmpty ||
            us(e._3) - us(acc.last.last._3) >= SeqAssembly.GapUs)
            acc :+ Vector(e)
          else acc.init :+ (acc.last :+ e)
      }
      sessions.zipWithIndex.map { case (s, i) =>
        (uid, i + 1L, s.length.toLong, s.map(_._4).distinct.length.toLong,
          s.map(_._4).mkString(">"))
      }
    }.sortBy(r => (r._1, r._2))
    val got = SeqAssembly.sessionSequences(spark, sfDir)
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == expected)
  }
}
