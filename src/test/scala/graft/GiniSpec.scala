package graft

import graft.ops.Gini

/** X109 — exact Gini: hand-computed distributions (all-equal = 0,
  * one-holder extreme, tie invariance, single doc) and an exact
  * driver-side replay on the real corpus.
  */
class GiniSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("total"),
        r.getAs[Long]("gini_num"), r.getAs[Long]("gini_den"),
        r.getAs[Double]("gini_q")))).toMap

  private def frame(rows: (String, Long, Long)*) =
    rows.toSeq.toDF("grp", "doc_id", "x")

  test("X109: all-equal masses give exactly zero") {
    // weights Σ(2i-n-1) over i=1..n sum to 0, so equal x cancels
    val out = rowsOf(Gini.giniOf(frame(
      ("g", 1L, 7L), ("g", 2L, 7L), ("g", 3L, 7L), ("g", 4L, 7L))))
    assert(out("g") == ((4L, 28L, 0L, 112L, 0.0)))
  }

  test("X109: one doc holding everything approaches 1 as (n-1)/n") {
    // x = (0,0,0,12): num = (2*4-5)*12 = 36, den = 4*12 = 48 → 0.75
    val out = rowsOf(Gini.giniOf(frame(
      ("g", 1L, 0L), ("g", 2L, 0L), ("g", 3L, 0L), ("g", 4L, 12L))))
    assert(out("g") == ((4L, 12L, 36L, 48L, 0.75)))
  }

  test("X109: hand-computed mixed case and tie invariance") {
    // x sorted = (1,2,2,5), n=4: weights (-3,-1,1,3) →
    // num = -3+(-2)+2+15 = 12; den = 4*10 = 40 → 0.3
    val a = rowsOf(Gini.giniOf(frame(
      ("g", 1L, 5L), ("g", 2L, 2L), ("g", 3L, 2L), ("g", 4L, 1L))))
    assert(a("g") == ((4L, 10L, 12L, 40L, 0.3)))
    // permute doc_ids among the tied 2s: value must not move
    val b = rowsOf(Gini.giniOf(frame(
      ("g", 1L, 5L), ("g", 9L, 2L), ("g", 0L, 2L), ("g", 4L, 1L))))
    assert(b("g") == a("g"))
  }

  test("X109: a single doc is exactly zero, not a special case") {
    val out = rowsOf(Gini.giniOf(frame(("g", 1L, 42L))))
    assert(out("g") == ((1L, 42L, 0L, 42L, 0.0)))
  }

  test("X109: blocked closed form equals the row-ranked replay on a " +
    "tie-heavy fixture") {
    // round-13 verdict item 3: the plan now pre-aggregates to distinct
    // (grp, x) blocks and emits each block's contribution in closed
    // form x·c·(2·cum_before + c − n). Pin blocked ≡ row-ranked on a
    // fixture where almost every value ties (the exact regime the
    // pre-aggregation exploits): 200 docs over only 7 distinct values.
    val docs = (1L to 200L).map(i => ("g" + (i % 3), i, (i * i) % 7))
    val expected = docs.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = sorted.length.toLong
      val tot = sorted.sum
      val num = sorted.zipWithIndex
        .map { case (x, i0) => (2 * (i0 + 1L) - n - 1) * x }.sum
      (n, tot, num, n * tot,
        if (tot == 0) 0.0 else num.toDouble / (n * tot).toDouble)
    }.toMap
    assert(rowsOf(Gini.giniOf(frame(docs: _*))) == expected)
  }

  test("X109: real corpus equals the exact integer replay") {
    val rows = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).view.mapValues { ds =>
      val sorted = ds.sortBy(d => (d._3, d._2)).map(_._3)
      val n = sorted.length.toLong
      val tot = sorted.sum
      val num = sorted.zipWithIndex
        .map { case (x, i0) => (2 * (i0 + 1L) - n - 1) * x }.sum
      (n, tot, num, n * tot,
        if (tot == 0) 0.0 else num.toDouble / (n * tot).toDouble)
    }.toMap
    assert(rowsOf(Gini.sourceGini(spark, sfDir)) == expected)
  }
}
