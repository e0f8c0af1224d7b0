package graft

import graft.ops.{Covariance, PowerIteration}

/** X120 — exact integer power iteration: a hand-computed 2-dim case
  * whose matrix entry forces the floor (not truncate) division branch
  * on a negative covariance, and an exact Math.floorDiv replay of the
  * full chain on the real corpus.
  */
class PowerIterationSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("dim") ->
      ((r.getAs[Long]("m_diag"), r.getAs[Long]("v1"),
        r.getAs[Long]("v2"), r.getAs[Long]("v3")))).toMap

  test("X120: hand-computed case exercises floor on a negative entry") {
    // vectors (1,-1), (-1,1), (1,1): q rows (1e4,-1e4), (-1e4,1e4),
    // (1e4,1e4); n=3, sx=(1e4,1e4); sxy00=sxy11=3e8, sxy01=-1e8
    // cov_num00 = 9e8-1e8 = 8e8, cov_num01 = -3e8-1e8 = -4e8
    // mden = 9e4 → m00 = m11 = floor(8888.9) = 8888,
    //              m01 = floor(-4444.4) = -4445 (floor, NOT -4444)
    val emb = Seq(
      (1L, Seq(1.0f, -1.0f)), (2L, Seq(-1.0f, 1.0f)),
      (3L, Seq(1.0f, 1.0f))).toDF("vec_id", "embedding")
    val out = rowsOf(PowerIteration.powerIterationOf(emb))
    val s = 8888L - 4445L // row sum 4443
    assert(out(0L) == ((8888L, s, s * s, s * s * s)))
    assert(out(1L) == ((8888L, s, s * s, s * s * s)))
  }

  test("X120: real corpus equals the exact Math.floorDiv replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * Covariance.Q).toLong).toArray)
    val n = vecs.length.toLong
    val d = vecs.head.length
    val sx = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val m = Array.tabulate(d, d) { (i, j) =>
      val sxy = vecs.map(v => v(i) * v(j)).sum
      Math.floorDiv(n * sxy - sx(i) * sx(j),
        n * n * PowerIteration.MQ)
    }
    def matvec(v: Array[Long]) =
      Array.tabulate(d)(j => (0 until d).map(i => m(i)(j) * v(i)).sum)
    val v1 = matvec(Array.fill(d)(1L))
    val v2 = matvec(v1)
    val v3 = matvec(v2)
    val got = rowsOf(PowerIteration.covPowerIteration(spark, sfDir))
    assert(got.size == d)
    (0 until d).foreach { j =>
      assert(got(j.toLong) == ((m(j)(j), v1(j), v2(j), v3(j))), s"dim $j")
    }
    // the iterate must be non-degenerate on real data
    assert(v3.exists(_ != 0L))
  }
}
