package graft

import graft.ops.RobustRange

/** X129 — robust range: hand-computed order statistics (including the
  * even-count lower cuts), tie handling through the (q, vec_id) order,
  * outlier insensitivity vs the mean, and an exact corpus replay.
  */
class RobustRangeSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("dim") ->
      ((r.getAs[Long]("n"), r.getAs[Long]("q1"), r.getAs[Long]("med"),
        r.getAs[Long]("q3"), r.getAs[Long]("iqr")))).toMap

  private def emb(vs: Seq[Float]*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("X129: hand-computed cuts on seven values") {
    // dim 0 values: 1..7 (whole floats — exactly representable, so
    // q = i·10⁶ exactly); n=7 → k1=2, k2=4, k3=6
    val vals = Seq(3f, 1f, 7f, 5f, 2f, 6f, 4f)
    val out = rowsOf(RobustRange.robustRangeOf(emb(vals.map(Seq(_)): _*)))
    val M = 1000000L
    assert(out(0L) == ((7L, 2 * M, 4 * M, 6 * M, 4 * M)))
  }

  test("X129: even count takes the lower cuts") {
    // values 1..4: n=4 → k1=(5)div 4=1, k2=2, k3=15 div 4=3
    val vals = Seq(2f, 4f, 1f, 3f)
    val out = rowsOf(RobustRange.robustRangeOf(emb(vals.map(Seq(_)): _*)))
    val M = 1000000L
    assert(out(0L) == ((4L, 1 * M, 2 * M, 3 * M, 2 * M)))
  }

  test("X129: one outlier moves the mean, not the quartiles") {
    val base = Seq(1f, 2f, 3f, 4f, 5f, 6f, 7f)
    val spiked = base.updated(6, 1e9f)
    val a = rowsOf(RobustRange.robustRangeOf(emb(base.map(Seq(_)): _*)))
    val b = rowsOf(RobustRange.robustRangeOf(emb(spiked.map(Seq(_)): _*)))
    assert(a(0L)._2 == b(0L)._2) // q1 unchanged
    assert(a(0L)._3 == b(0L)._3) // median unchanged
  }

  test("X129: real corpus equals the exact order-statistic replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val d = vecs.head._2.length
    val expected = (0 until d).map { dim =>
      val qs = vecs.map { case (id, v) =>
        (math.floor(v(dim).toDouble * RobustRange.Q).toLong, id) }
        .sortBy(identity).map(_._1)
      val n = qs.length.toLong
      def k(i: Long) = qs((i - 1).toInt)
      val (k1, k2, k3) = ((n + 1) / 4, (n + 1) / 2, (3 * (n + 1)) / 4)
      dim.toLong -> ((n, k(k1), k(k2), k(k3), k(k3) - k(k1)))
    }.toMap
    val got = rowsOf(RobustRange.dimRobustRange(spark, sfDir))
    assert(got == expected)
  }
}
