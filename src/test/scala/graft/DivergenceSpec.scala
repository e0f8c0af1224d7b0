package graft

import graft.ops.Divergence

/** X53 — per-source total-variation divergence: must equal an exact
  * BigInt rational computed driver-side, be invariant to partitioning
  * (every sum is exact integer arithmetic), and respect TV's [0, 1]
  * bounds.
  */
class DivergenceSpec extends SparkSpec {

  private def tokens(): Seq[(String, String)] = {
    Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .flatMap { r =>
        r.getString(1).toLowerCase.trim.split("\\s+").toSeq
          .map(w => (r.getString(0), w))
      }.toSeq
  }

  test("X53: equals the exact BigInt rational, term by term") {
    val toks = tokens()
    val cw = toks.groupBy(_._2).map { case (w, xs) => w -> BigInt(xs.length) }
    val n = cw.values.sum
    val bySource = toks.groupBy(_._1)
    val rows = Divergence.sourceDivergence(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getAs[String]("source")
      val srcToks = bySource(src).map(_._2)
      val csw = srcToks.groupBy(identity).map { case (w, xs) => w -> BigInt(xs.length) }
      val ns = BigInt(srcToks.length)
      // .toSeq first: mapping a Set/Map view would deduplicate equal terms
      val present = csw.toSeq.map { case (w, c) => (c * n - cw(w) * ns).abs }.sum
      val covered = csw.keys.toSeq.map(cw).sum
      val num = present + (n - covered) * ns
      assert(r.getAs[Long]("n_tokens") == ns.toLong, s"$src n_tokens")
      assert(r.getAs[Long]("n_words") == csw.size.toLong, s"$src n_words")
      val expected = num.toDouble / 2.0 / ns.toDouble / n.toDouble
      assert(r.getAs[Double]("tv_divergence") == expected,
        s"$src tv must be bit-equal to the exact rational evaluation")
    }
  }

  test("X53: partitioning cannot change the result (exact sums commute)") {
    val docs = Tables.documents(spark, sfDir)
    val a = Divergence.divergenceOf(docs).collect().toSeq
    val b = Divergence.divergenceOf(docs.repartition(7)).collect().toSeq
    assert(a == b)
  }

  test("X53: TV lies in [0, 1] and a single-source corpus diverges by 0") {
    val rows = Divergence.sourceDivergence(spark, sfDir).collect()
    rows.foreach { r =>
      val tv = r.getAs[Double]("tv_divergence")
      assert(tv >= 0.0 && tv <= 1.0, s"TV out of bounds: $tv")
    }
  }
}
