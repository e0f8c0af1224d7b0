package graft

import graft.ops.KsDrift

/** X117 — exact two-sample KS: identical distributions ⇒ 0, disjoint
  * supports ⇒ exactly 1, a hand-computed interleaved case, the
  * single-group degenerate, and an exact driver-side replay on the
  * real corpus.
  */
class KsDriftSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_in"), r.getAs[Long]("n_rest"),
        r.getAs[Long]("d_num"), r.getAs[Long]("d_den"),
        r.getAs[Double]("ks_q")))).toMap

  private def frame(rows: (String, Long)*) = rows.toSeq.toDF("grp", "v")

  test("X117: identical distributions give exactly zero") {
    val out = rowsOf(KsDrift.ksOf(frame(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 1L), ("b", 2L), ("b", 3L))))
    assert(out("a") == ((3L, 3L, 0L, 9L, 0.0)))
    assert(out("b") == ((3L, 3L, 0L, 9L, 0.0)))
  }

  test("X117: disjoint supports give exactly one") {
    val out = rowsOf(KsDrift.ksOf(frame(
      ("a", 1L), ("a", 2L), ("b", 10L), ("b", 11L), ("b", 12L))))
    assert(out("a") == ((2L, 3L, 6L, 6L, 1.0)))
    assert(out("b") == ((3L, 2L, 6L, 6L, 1.0)))
  }

  test("X117: hand-computed interleaved case") {
    // a = {1, 3}, b = {2, 4}: spine 1,2,3,4
    // for a (n_in=2, n_rest=2): cum_a = 1,1,2,2; cum_b = 0,1,1,2
    // |cum_a*2 - cum_b*2| = 2,0,2,0 → d_num = 2, d_den = 4 → 0.5
    val out = rowsOf(KsDrift.ksOf(frame(
      ("a", 1L), ("a", 3L), ("b", 2L), ("b", 4L))))
    assert(out("a") == ((2L, 2L, 2L, 4L, 0.5)))
    assert(out("b") == ((2L, 2L, 2L, 4L, 0.5)))
  }

  test("X117: a single group degenerates to zero, not an error") {
    val out = rowsOf(KsDrift.ksOf(frame(("a", 1L), ("a", 5L))))
    assert(out("a") == ((2L, 0L, 0L, 0L, 0.0)))
  }

  test("X117: real corpus equals the exact integer replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val values = docs.map(_._2).distinct.sorted
    val expected = docs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      .map { case (g, vs) =>
        val nIn = vs.length.toLong
        val nRest = n - nIn
        val dNum = values.map { t =>
          val cumIn = vs.count(_ <= t).toLong
          val cumRest = docs.count(d => d._1 != g && d._2 <= t).toLong
          math.abs(cumIn * nRest - cumRest * nIn)
        }.max
        g -> ((nIn, nRest, dNum, nIn * nRest))
      }
    val got = rowsOf(KsDrift.sourceLengthKs(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, (nIn, nRest, dNum, dDen, ks)) =>
      assert((nIn, nRest, dNum, dDen) == expected(g), g)
      assert(ks == dNum.toDouble / dDen.toDouble)
      assert(dNum > 0L) // real sources differ somewhere
    }
  }
}
