package graft

import graft.ops.{Assortativity, CorpusIndex}

/** X123 — exact assortativity: star ⇒ exactly −1, regular graphs ⇒
  * den 0 / r = 0 convention, a hand-computed mixed graph, and an
  * exact integer replay on the real collocation graph.
  */
class AssortativitySpec extends SparkSpec {

  import spark.implicits._

  private def rowOf(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().head
    (r.getAs[Long]("n_edges"), r.getAs[Long]("n_stubs"),
      r.getAs[Long]("r_num"), r.getAs[Long]("r_den"),
      r.getAs[Double]("r_q"))
  }

  private def edges(es: (String, String)*) = es.toSeq.toDF("u", "v")

  test("X123: a star is exactly -1 (perfectly disassortative)") {
    val out = rowOf(Assortativity.assortativityOf(edges(
      ("hub", "x"), ("hub", "y"), ("hub", "z"))))
    // stubs: (3,1)x3 + (1,3)x3 → num = -36, den = 36
    assert(out == ((3L, 6L, -36L, 36L, -1.0)))
  }

  test("X123: a regular graph defines r = 0 (den = 0)") {
    // 4-cycle: every degree 2
    val out = rowOf(Assortativity.assortativityOf(edges(
      ("a", "b"), ("b", "c"), ("c", "d"), ("a", "d"))))
    assert(out._4 == 0L)
    assert(out._5 == 0.0)
  }

  test("X123: hand-computed triangle with a pendant") {
    // degs a=3 b=2 c=2 d=1; stubs n=8, Σx=18, Σxy=38, Σx²=44
    // num = 8·38−324 = −20; den = 8·44−324 = 28 → r = −5/7
    val out = rowOf(Assortativity.assortativityOf(edges(
      ("a", "b"), ("a", "c"), ("b", "c"), ("a", "d"))))
    assert(out == ((4L, 8L, -20L, 28L, -20.0 / 28.0)))
  }

  test("X123: real collocation graph equals the exact integer replay") {
    val es = CorpusIndex.collocationEdges(spark, sfDir)
      .collect().map(r => (r.getAs[String]("u"), r.getAs[String]("v")))
    val deg = (es.map(_._1) ++ es.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val stubs = es.flatMap { case (u, v) =>
      Seq((deg(u), deg(v)), (deg(v), deg(u))) }
    val n = stubs.length.toLong
    val sx = stubs.map(_._1).sum
    val sxy = stubs.map(p => p._1 * p._2).sum
    val sxx = stubs.map(p => p._1 * p._1).sum
    val out = rowOf(Assortativity.degreeAssortativity(spark, sfDir))
    assert(out._1 == es.length.toLong)
    assert(out._2 == n)
    assert(out._3 == n * sxy - sx * sx)
    assert(out._4 == n * sxx - sx * sx)
    if (out._4 > 0)
      assert(out._5 == out._3.toDouble / out._4.toDouble)
  }
}
