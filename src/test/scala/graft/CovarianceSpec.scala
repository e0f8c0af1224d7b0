package graft

import graft.ops.Covariance

/** X113 — exact quantized covariance: hand-computed 2-dim fixtures
  * (perfect correlation, anti-correlation, independence, quantization
  * floor) and an exact driver-side integer replay on the real
  * embeddings.
  */
class CovarianceSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("i"), r.getAs[Long]("j")) ->
      ((r.getAs[Long]("n"), r.getAs[Long]("sxy"),
        r.getAs[Long]("sx_i"), r.getAs[Long]("sx_j"),
        r.getAs[Long]("cov_num"), r.getAs[Long]("cov_den")))).toMap

  private def emb(vs: Seq[Float]*) =
    vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
      .toDF("vec_id", "embedding")

  test("X113: perfectly correlated dims carry a positive exact cov") {
    // vectors (1,1), (-1,-1): q = (10000, 10000), (-10000, -10000)
    // sxy(0,1) = 1e8 + 1e8 = 2e8; sx = 0 → cov_num = 2*2e8 = 4e8
    val out = rowsOf(Covariance.covarianceOf(
      emb(Seq(1f, 1f), Seq(-1f, -1f))))
    assert(out((0L, 1L)) == ((2L, 200000000L, 0L, 0L, 400000000L,
      (2L * 2L * 100000000L))))
    // the diagonal is the quantized second moment
    assert(out((0L, 0L))._2 == 200000000L)
  }

  test("X113: anti-correlated and independent dims") {
    // (1,-1), (-1,1): sxy(0,1) = -2e8 → cov_num = -4e8
    val a = rowsOf(Covariance.covarianceOf(emb(Seq(1f, -1f), Seq(-1f, 1f))))
    assert(a((0L, 1L))._5 == -400000000L)
    // 4 vectors making dims independent: (1,1),(1,-1),(-1,1),(-1,-1)
    // sxy(0,1) = 1e8 - 1e8 - 1e8 + 1e8 = 0, sx = sy = 0 → cov 0
    val b = rowsOf(Covariance.covarianceOf(
      emb(Seq(1f, 1f), Seq(1f, -1f), Seq(-1f, 1f), Seq(-1f, -1f))))
    assert(b((0L, 1L))._5 == 0L)
  }

  test("X113: quantization floors toward -inf, matching both engines") {
    // x = 0.00005 → q = floor(0.5) = 0; x = -0.00005 → q = floor(-0.5) = -1
    val out = rowsOf(Covariance.covarianceOf(emb(Seq(0.00005f, -0.00005f))))
    assert(out((0L, 0L))._2 == 0L)   // 0*0
    assert(out((1L, 1L))._2 == 1L)   // (-1)*(-1)
  }

  test("X113: real embeddings equal the exact integer replay") {
    val rows = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getSeq[Float](1).toArray
        .map(x => math.floor(x.toDouble * Covariance.Q).toLong))
    val d = rows.head.length
    val n = rows.length.toLong
    val sx = Array.tabulate(d)(i => rows.map(_(i)).sum)
    val expected = (for {
      i <- 0 until d; j <- i until d
      sxy = rows.map(v => v(i) * v(j)).sum
    } yield (i.toLong, j.toLong) ->
      ((n, sxy, sx(i), sx(j), n * sxy - sx(i) * sx(j),
        n * n * (Covariance.Q * Covariance.Q).toLong))).toMap
    assert(rowsOf(Covariance.dimCovariance(spark, sfDir)) == expected)
  }
}
