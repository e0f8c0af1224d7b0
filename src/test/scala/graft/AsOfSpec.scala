package graft

import java.sql.Timestamp

import graft.ops.AsOf

/** As-of join semantics on controlled inputs: inclusive ties, no-match
  * nulls, latest-wins, and key isolation (the oracle validates against
  * DuckDB's native ASOF JOIN; these pin the semantics readably).
  */
class AsOfSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("picks latest at-or-before per key; null when nothing precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), 100L),
      (1L, ts("2026-01-01 12:00:00"), 101L),
      (2L, ts("2026-01-01 10:30:00"), 200L), // before any right row for key 2
      (3L, ts("2026-01-01 10:00:00"), 300L)  // key with no right rows at all
    ).toDF("key", "ts", "event_id")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 11L, 1.0),
      (1L, ts("2026-01-01 11:00:00"), 12L, 2.0),
      (1L, ts("2026-01-01 12:00:00"), 13L, 3.0), // exact tie with left 101
      (2L, ts("2026-01-01 11:00:00"), 21L, 4.0)
    ).toDF("key", "ts", "o_orderkey", "o_totalprice")
    val out = AsOf.join(left, right, Seq("o_orderkey", "o_totalprice"))
      .orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("o_orderkey")).map(_.toLong)))
    assert(out.toSeq == Seq(
      100L -> Some(11L), // 10:00 → latest ≤ is 09:00
      101L -> Some(13L), // tie at 12:00 is inclusive
      200L -> None,      // right row exists but only later
      300L -> None))     // no right rows for key
  }

  test("tolerance variant: stale matches null out, fresh ones survive") {
    import spark.implicits._
    val left = Seq(
      (1L, ts("2026-01-01 10:00:00"), 1L),
      (1L, ts("2026-01-01 12:00:00"), 2L)
    ).toDF("key", "ts", "event_id")
    val right = Seq(
      (1L, ts("2026-01-01 09:59:00"), 11L, 1.0) // 1 min before the first left row
    ).toDF("key", "ts", "o_orderkey", "o_totalprice")
    val out = AsOf.joinWithTolerance(left, right,
      Seq("o_orderkey", "o_totalprice"), toleranceSec = 600)
      .orderBy("event_id").collect()
    assert(out(0).getAs[java.lang.Long]("o_orderkey") == 11L) // 1 min old: fresh
    assert(out(1).isNullAt(out(1).fieldIndex("o_orderkey")),
      "a 2-hour-old match must be nulled by a 10-minute tolerance")
  }

  test("directional: forward takes earliest-at-or-after, nearest picks the closer side") {
    import spark.implicits._
    val left = Seq((1L, ts("2026-01-01 10:00:00"), 1L)).toDF("key", "ts", "event_id")
    val right = Seq(
      (1L, ts("2026-01-01 09:57:00"), 11L, 1.0), // 3 min before
      (1L, ts("2026-01-01 10:01:00"), 12L, 2.0), // 1 min after
      (1L, ts("2026-01-01 10:30:00"), 13L, 3.0)
    ).toDF("key", "ts", "o_orderkey", "o_totalprice")
    def run(dir: String): Long =
      AsOf.joinDirectional(left, right, Seq("o_orderkey", "o_totalprice"), dir)
        .collect()(0).getAs[Long]("o_orderkey")
    assert(run("backward") == 11L)
    assert(run("forward") == 12L)
    assert(run("nearest") == 12L) // 1 min after beats 3 min before
    // nearest ties go backward
    val tieRight = Seq(
      (1L, ts("2026-01-01 09:59:00"), 21L, 1.0),
      (1L, ts("2026-01-01 10:01:00"), 22L, 2.0)
    ).toDF("key", "ts", "o_orderkey", "o_totalprice")
    assert(AsOf.joinDirectional(left, tieRight, Seq("o_orderkey", "o_totalprice"), "nearest")
      .collect()(0).getAs[Long]("o_orderkey") == 21L)
  }

  test("duplicate right timestamps resolve to one deterministic survivor") {
    import spark.implicits._
    val left = Seq((1L, ts("2026-01-01 10:00:00"), 1L)).toDF("key", "ts", "event_id")
    val right = Seq(
      (1L, ts("2026-01-01 09:00:00"), 5L, 1.0),
      (1L, ts("2026-01-01 09:00:00"), 9L, 2.0) // same (key, ts): max key wins
    ).toDF("key", "ts", "o_orderkey", "o_totalprice")
    val out = AsOf.join(left, right, Seq("o_orderkey", "o_totalprice")).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("o_orderkey") == 9L)
  }
}
