package graft

import graft.ops.{Assign, RandIndex}

/** X121 — exact Rand/ARI: identical partitions ⇒ RI = ARI = 1, a
  * hand-computed textbook contingency, the degenerate single-block
  * case (ARI defined 0), label permutation invariance, and an exact
  * pair-count replay on the real corpus assignment.
  */
class RandIndexSpec extends SparkSpec {

  import spark.implicits._

  private def rowOf(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().head
    (r.getAs[Long]("n"), r.getAs[Long]("pairs_both"),
      r.getAs[Long]("pairs_cluster"), r.getAs[Long]("pairs_label"),
      r.getAs[Long]("pairs_total"), r.getAs[Long]("ri_num"),
      r.getAs[Long]("ri_den"), r.getAs[Long]("ari_num"),
      r.getAs[Long]("ari_den"), r.getAs[Double]("ri_q"),
      r.getAs[Double]("ari_q"))
  }

  private def frame(rows: (String, String)*) = rows.toSeq.toDF("k", "c")

  test("X121: identical partitions give RI = ARI = 1 exactly") {
    val out = rowOf(RandIndex.agreementOf(frame(
      ("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"), ("c", "c"))))
    assert(out._10 == 1.0) // ri_q
    assert(out._11 == 1.0) // ari_q
  }

  test("X121: hand-computed textbook contingency") {
    // clusters: k1 = {c1,c1,c2}, k2 = {c1,c2,c2}; N = 6, T = 15
    // cells: (k1,c1)=2, (k1,c2)=1, (k2,c1)=1, (k2,c2)=2
    // a = C(2,2)+0+0+C(2,2) = 1+1 = 2; a_k = (3,3) → pc = 3+3 = 6
    // b_c = (3,3) → pl = 6
    // ri_num = 15 - 6 - 6 + 4 = 7 → RI = 7/15
    // ari_num = 2*(15*2 - 36) = -12; ari_den = 15*12 - 72 = 108
    val out = rowOf(RandIndex.agreementOf(frame(
      ("k1", "c1"), ("k1", "c1"), ("k1", "c2"),
      ("k2", "c1"), ("k2", "c2"), ("k2", "c2"))))
    assert(out == ((6L, 2L, 6L, 6L, 15L, 7L, 15L, -12L, 108L,
      7.0 / 15.0, -12.0 / 108.0)))
  }

  test("X121: single-block degenerate defines ARI = 0, RI = 1") {
    val out = rowOf(RandIndex.agreementOf(frame(
      ("k", "c"), ("k", "c"), ("k", "c"))))
    assert(out._10 == 1.0)
    assert(out._9 == 0L)   // ari_den
    assert(out._11 == 0.0) // ari_q by convention
  }

  test("X121: invariant under cluster-name permutation") {
    val p1 = rowOf(RandIndex.agreementOf(frame(
      ("x", "c1"), ("x", "c2"), ("y", "c2"), ("y", "c2"))))
    val p2 = rowOf(RandIndex.agreementOf(frame(
      ("y", "c1"), ("y", "c2"), ("x", "c2"), ("x", "c2"))))
    assert(p1 == p2)
  }

  test("X121: real corpus equals the exact pair-count replay") {
    val asg = Assign.centroidAssign(spark, sfDir)
      .select("nearest_label", "label").collect()
      .map(r => (r.get(0).toString, r.get(1).toString))
    val n = asg.length.toLong
    def c2(x: Long) = x * (x - 1) / 2
    val a = asg.groupBy(identity).values.map(g => c2(g.length.toLong)).sum
    val pc = asg.groupBy(_._1).values.map(g => c2(g.length.toLong)).sum
    val pl = asg.groupBy(_._2).values.map(g => c2(g.length.toLong)).sum
    val t = c2(n)
    val out = rowOf(RandIndex.clusterLabelAgreement(spark, sfDir))
    assert(out._1 == n)
    assert(out._2 == a); assert(out._3 == pc); assert(out._4 == pl)
    assert(out._5 == t)
    assert(out._6 == t - pc - pl + 2 * a)
    assert(out._8 == 2 * (t * a - pc * pl))
    assert(out._9 == t * (pc + pl) - 2 * pc * pl)
    // the label-seeded assignment must agree better than chance (the
    // sf0.001 clusters overlap heavily — ARI ≈ 0.09 — so the pin is
    // sign, not magnitude; chance alone would center on 0)
    assert(out._11 > 0.0)
  }
}
