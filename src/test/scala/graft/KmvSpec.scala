package graft

import java.security.MessageDigest

import graft.ops.Kmv

/** X134 — KMV: losslessness below capacity, duplicate collapse, the
  * exact order-statistic + estimate replay on the real corpus, and
  * the relative-error band at a group above capacity.
  */
class KmvSpec extends SparkSpec {

  import spark.implicits._

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_distinct"), r.getAs[Long]("k_used"),
        r.getAs[Long]("kth_hash"), r.getAs[Double]("est_q")))).toMap

  test("X134: below capacity the sketch is lossless (est = exact)") {
    val rows = Seq(("g", "a"), ("g", "b"), ("g", "c"), ("g", "a"))
      .toDF("grp", "v")
    val out = rowsOf(Kmv.kmvOf(rows))
    assert(out("g")._1 == 3L) // duplicates collapse
    assert(out("g")._2 == 3L)
    assert(out("g")._4 == 3.0)
  }

  test("X134: real corpus equals the exact replay; error in band") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).view.mapValues { g =>
      val hs = g.map(d => md5Long40Ref(d._2)).distinct.sorted
      val nd = hs.length.toLong
      val kUsed = math.min(nd, Kmv.K.toLong)
      val kth = hs(kUsed.toInt - 1)
      val est = if (nd < Kmv.K) nd.toDouble
        else (Kmv.K - 1).toDouble * (1L << 40).toDouble / kth.toDouble
      (nd, kUsed, kth, est)
    }.toMap
    val got = rowsOf(Kmv.kmvDistinctContent(spark, sfDir))
    assert(got.keySet == expected.keySet)
    got.foreach { case (g, v) => assert(v == expected(g), g) }

    // error band at a group above capacity: pool the whole corpus
    val all = Kmv.kmvOf(Tables.documents(spark, sfDir)
      .selectExpr("'all' AS grp", "text AS v"))
    val (nd, kUsed, _, est) = rowsOf(all)("all")
    if (nd >= Kmv.K) {
      assert(kUsed == Kmv.K.toLong)
      val rel = math.abs(est / nd.toDouble - 1.0)
      // theoretical sd ≈ 1/sqrt(k−2) ≈ 0.127; allow 4 sigma
      assert(rel < 0.51, s"KMV rel error $rel (n=$nd, est=$est)")
    } else {
      assert(est == nd.toDouble) // tiny corpus: lossless path again
    }
  }
}
