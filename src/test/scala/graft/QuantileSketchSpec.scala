package graft

import java.security.MessageDigest

import graft.ops.QuantileSketch

/** X135 — hash-sample quantile sketch: losslessness below capacity,
  * the bottom-k merge law (the mergeability that makes it a 100 TB
  * sketch), partition-count invariance, and the exact driver-side
  * replay of both the sample selection and the order-statistic
  * estimates on the real corpus.
  */
class QuantileSketchSpec extends SparkSpec {

  import spark.implicits._

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  /** Lower order statistic at ⌈q%·n⌉ of the sorted values. */
  private def lowerQ(sorted: Seq[Long], q: Int): Long =
    sorted(((sorted.size.toLong * q + 99) / 100).toInt - 1)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") -> r).toMap

  test("X135: below capacity est = exact for every quantile") {
    val rows = (1L to 10L).map(i => ("g", i, i * 7))
      .toDF("grp", "id", "v")
    val out = rowsOf(QuantileSketch.sketchOf(rows))("g")
    assert(out.getAs[Long]("n_rows") == 10L)
    assert(out.getAs[Long]("k_used") == 10L)
    QuantileSketch.Qs.foreach { q =>
      assert(out.getAs[Long](s"est_p$q") == out.getAs[Long](s"exact_p$q"),
        s"p$q diverged below capacity")
    }
    // and the order statistic itself is the lower one: p50 of
    // {7,...,70} is the 5th value = 35
    assert(out.getAs[Long]("exact_p50") == 35L)
    assert(out.getAs[Long]("exact_p25") == 21L) // ⌈2.5⌉ = 3rd = 21
    assert(out.getAs[Long]("exact_p90") == 63L) // 9th = 63
  }

  test("X135: bottom-k samples merge by union (the 100 TB law)") {
    val docs = Tables.documents(spark, sfDir).select(
      $"source".as("grp"), $"doc_id".as("id"), $"n_chars".as("v"))
    val a = docs.filter($"id" % 2 === 0)
    val b = docs.filter($"id" % 2 =!= 0)
    val merged = QuantileSketch.sampleOf(
      QuantileSketch.sampleOf(a).unionByName(QuantileSketch.sampleOf(b)))
    val direct = QuantileSketch.sampleOf(docs)
    val key = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("id")))
        .toSet
    assert(key(merged) == key(direct),
      "bottom-k of shard-wise bottom-k must equal the global bottom-k")
  }

  test("X135: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir).select(
      $"source".as("grp"), $"doc_id".as("id"), $"n_chars".as("v"))
    val one = QuantileSketch.sketchOf(docs).collect().map(_.toString).toSeq
    val seven = QuantileSketch.sketchOf(docs.repartition(7))
      .collect().map(_.toString).toSeq
    assert(one == seven)
  }

  test("X135: real corpus equals the exact driver-side replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).map { case (grp, g) =>
      val sample = g.sortBy(d => (md5Long40Ref(d._2 + ":qs"), d._2))
        .take(QuantileSketch.K)
      val sv = sample.map(_._3).sorted.toSeq
      val ev = g.map(_._3).sorted.toSeq
      grp -> (g.size.toLong, sample.size.toLong,
        QuantileSketch.Qs.map(q => lowerQ(sv, q)),
        QuantileSketch.Qs.map(q => lowerQ(ev, q)))
    }
    val got = rowsOf(QuantileSketch.quantileSketch(spark, sfDir))
    assert(got.keySet == expected.keySet)
    expected.foreach { case (grp, (n, k, est, exact)) =>
      val r = got(grp)
      assert(r.getAs[Long]("n_rows") == n, s"$grp n")
      assert(r.getAs[Long]("k_used") == k, s"$grp k")
      QuantileSketch.Qs.zipWithIndex.foreach { case (q, i) =>
        assert(r.getAs[Long](s"est_p$q") == est(i), s"$grp est_p$q")
        assert(r.getAs[Long](s"exact_p$q") == exact(i), s"$grp exact_p$q")
      }
    }
  }
}
