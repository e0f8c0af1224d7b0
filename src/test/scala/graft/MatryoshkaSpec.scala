package graft

import graft.ops.Matryoshka

/** X102 — matryoshka recall sweep: the full-width anchor, curve
  * well-formedness, and an exact driver-side replay (sliced quantized
  * cosines, both rankings, the overlap) on the real embeddings.
  */
class MatryoshkaSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("dim"), r.getAs[Long]("query_id")) ->
      ((r.getAs[Long]("n_top"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))).toMap

  test("X102: the full-width row anchors the curve at recall 1") {
    val got = rowsOf(Matryoshka.matryoshkaRecall(spark, sfDir))
    val full = got.filter(_._1._1 == Matryoshka.FullDim.toLong)
    assert(full.nonEmpty)
    assert(full.values.forall(v => v._1 == 5L && v._2 == 5L && v._3 == 1.0))
    // every (dim, query) cell exists and is well-formed
    assert(got.size == Matryoshka.Dims.size * 3)
    assert(got.values.forall(v => v._1 == 5L && v._3 >= 0.0 && v._3 <= 1.0))
  }

  test("X102: real sweep equals the exact driver-side replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dotQ(a: Array[Float], b: Array[Float], d: Int): Long =
      (0 until d).map(i =>
        math.floor(a(i).toDouble * b(i).toDouble * 1e15).toLong).sum
    def cos(a: Array[Float], b: Array[Float], d: Int): Double = {
      val n = math.sqrt(dotQ(a, a, d).toDouble) *
        math.sqrt(dotQ(b, b, d).toDouble)
      if (n == 0.0) 0.0 else dotQ(a, b, d).toDouble / n
    }
    val queries = vecs.filter(_._1 < 3)
    val top = (for {
      d <- Matryoshka.Dims
      (qid, qe) <- queries
    } yield {
      val ranked = vecs.filter(_._1 != qid)
        .map { case (vid, ve) => (vid, cos(ve, qe, d)) }
        .sortBy { case (vid, c) => (-c, vid) }.take(5).map(_._1).toSet
      (d.toLong, qid) -> ranked
    }).toMap
    val expected = top.map { case ((d, qid), ids) =>
      val ref = top((Matryoshka.FullDim.toLong, qid))
      val hit = ids.intersect(ref).size.toLong
      (d, qid) -> ((5L, hit, hit / 5.0))
    }
    assert(rowsOf(Matryoshka.matryoshkaRecall(spark, sfDir)) == expected)
  }
}
