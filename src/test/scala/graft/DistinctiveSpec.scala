package graft

import graft.ops.Distinctive

/** X130 — distinctive terms: the exact 2×2 replay on the real corpus
  * (cells, marginals, smoothed odds, rank), plus structural pins on
  * the rank window and the df floor.
  */
class DistinctiveSpec extends SparkSpec {

  test("X130: real corpus equals the exact odds-ratio replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val nAll = docs.length.toLong
    val nSrc = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cells = docs
      .flatMap { case (s, _, t) =>
        t.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct
          .map(w => (s, w)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dfAll = cells.groupBy(_._1._2).view
      .mapValues(_.values.sum).filter(_._2 >= Distinctive.MinDf).toMap
    val expected = cells.toSeq
      .filter { case ((_, w), _) => dfAll.contains(w) }
      .map { case ((s, w), a) =>
        val b = nSrc(s) - a
        val c = dfAll(w) - a
        val d = nAll - nSrc(s) - c
        (s, w, a, ((a + 1) * (d + 1)).toDouble / ((b + 1) * (c + 1)))
      }
      .groupBy(_._1).view.mapValues { g =>
        g.sortBy { case (_, w, _, or) => (-or, w) }
          .take(Distinctive.K)
          .zipWithIndex
          .map { case ((s, w, a, or), i) =>
            (i + 1L, w, a, dfAll(w), or) }
      }.toMap
    val got = Distinctive.distinctiveTerms(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(5), r.getDouble(6)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)
        .map(t => (t._2, t._3, t._4, t._5, t._6)).toSeq).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (s, rows) =>
      assert(rows == expected(s), s)
      assert(rows.map(_._1) == (1L to rows.length).toSeq) // dense ranks
    }
  }

  test("X130: every reported term clears the corpus df floor") {
    val rows = Distinctive.distinctiveTerms(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Long]("df_all") >= Distinctive.MinDf))
  }
}
