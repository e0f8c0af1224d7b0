package graft

import graft.ops.PathMining

/** X127 — path trigrams: hand-computed overlapping trigrams, per-user
  * isolation, the deterministic top-K order, and an exact replay on
  * the real corpus.
  */
class PathMiningSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("path"),
      r.getAs[Long]("n_occurrences"), r.getAs[Long]("n_users")))

  private def eventsOf(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("user_id", "d", "event_id", "event_type")
      .selectExpr("user_id", "CAST(d AS TIMESTAMP) AS ts", "event_id",
        "event_type")

  test("X127: overlapping position-anchored trigrams, counted per user") {
    // user 1: a b a b → aba, bab (one each); user 2: a b a → aba
    val out = rowsOf(PathMining.pathTrigramsOf(eventsOf(
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (1L, "2024-01-01 00:00:02", 2L, "b"),
      (1L, "2024-01-01 00:00:03", 3L, "a"),
      (1L, "2024-01-01 00:00:04", 4L, "b"),
      (2L, "2024-01-01 00:00:01", 5L, "a"),
      (2L, "2024-01-01 00:00:02", 6L, "b"),
      (2L, "2024-01-01 00:00:03", 7L, "a")))).toList
    // a>b>a: 2 occurrences, 2 users; b>a>b: 1, 1 → order puts aba first
    assert(out == List(("a>b>a", 2L, 2L), ("b>a>b", 1L, 1L)))
  }

  test("X127: paths never cross user boundaries") {
    val out = rowsOf(PathMining.pathTrigramsOf(eventsOf(
      (1L, "2024-01-01 00:00:01", 1L, "a"),
      (1L, "2024-01-01 00:00:02", 2L, "b"),
      (2L, "2024-01-01 00:00:03", 3L, "c"))))
    assert(out.isEmpty) // no user has 3 events
  }

  test("X127: real corpus equals the exact replay") {
    val events = Tables.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS us", "event_id",
        "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val tri = events.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val t = es.sortBy(e => (e._2, e._3)).map(_._4)
      t.sliding(3).filter(_.size == 3).map(s => (s.mkString(">"), u))
    }
    val byPath = tri.groupBy(_._1).view.mapValues(g =>
      (g.size.toLong, g.map(_._2).distinct.size.toLong)).toMap
    val expected = byPath.toSeq
      .map { case (p, (occ, users)) => (p, occ, users) }
      .sortBy { case (p, occ, users) => (-users, -occ, p) }
      .take(PathMining.K)
    val got = rowsOf(PathMining.topPathTrigrams(spark, sfDir)).toList
    assert(got == expected.toList)
    assert(got.nonEmpty)
  }
}
