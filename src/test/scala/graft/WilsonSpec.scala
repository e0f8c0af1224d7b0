package graft

import graft.ops.Wilson

/** X131 — Wilson dup-rate bands: exact count replay, the ordering
  * invariant 0 ≤ lo ≤ p̂ ≤ hi ≤ 1, width shrinking with n on crafted
  * frames, and the exact same-expression float replay.
  */
class WilsonSpec extends SparkSpec {

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("source") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dup"),
        r.getAs[Double]("p_q"), r.getAs[Double]("wilson_lo"),
        r.getAs[Double]("wilson_hi")))).toMap

  private def wilson(k: Long, n: Long): (Double, Double, Double) = {
    // the op's exact expression tree, replayed operation-for-operation
    val nn = n.toDouble
    val p = k.toDouble / nn
    val core = p + Wilson.Z2 / (2.0 * nn)
    val rad = math.sqrt((p * (1.0 - p)) / nn +
      Wilson.Z2 / (4.0 * nn * nn))
    val den = 1.0 + Wilson.Z2 / nn
    (p, math.max(0.0, (core - Wilson.Z * rad) / den),
      (core + Wilson.Z * rad) / den)
  }

  test("X131: real corpus equals the exact count + expression replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val dupTexts = docs.groupBy(_._2).filter(_._2.length >= 2).keySet
    val expected = docs.groupBy(_._1).view.mapValues { g =>
      val n = g.length.toLong
      val k = g.count(d => dupTexts.contains(d._2)).toLong
      val (p, lo, hi) = wilson(k, n)
      (n, k, p, lo, hi)
    }.toMap
    val got = rowsOf(Wilson.dupRateWilson(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (s, v) => assert(v == expected(s), s) }
  }

  test("X131: bands are ordered and inside [0, 1]") {
    val got = rowsOf(Wilson.dupRateWilson(spark, sfDir))
    got.values.foreach { case (_, _, p, lo, hi) =>
      assert(lo >= 0.0 && hi <= 1.0)
      assert(lo <= p && p <= hi)
    }
  }

  test("X131: the band narrows as n grows at fixed rate") {
    // pure-function check on the replayed expression itself
    val (_, lo1, hi1) = wilson(5, 50)
    val (_, lo2, hi2) = wilson(500, 5000)
    assert(hi2 - lo2 < hi1 - lo1)
  }
}
