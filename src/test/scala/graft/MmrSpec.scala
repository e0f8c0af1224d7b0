package graft

import graft.ops.Mmr

/** X122 — MMR re-ranking: the crafted duplicate-demotion case (an
  * exact duplicate of the top pick loses round 2 to a diverse
  * candidate despite equal relevance), rank-1 ≡ relevance top-1, and
  * an exact driver-side greedy replay on the real corpus.
  */
class MmrSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("sel_rank") ->
      r.getAs[Long]("vec_id")).toMap

  test("X122: an exact duplicate of the top pick is demoted") {
    // q = (1,0); c1 = c2 = (0.936, 0.352) (exact duplicates, rel max);
    // c3 = (0.936, -0.352): same relevance, sim(c3,c1) ≈ 0.752 while
    // sim(c2,c1) ≈ 1 → round 2 takes c3 (score ≈ +0.09 vs ≈ −0.03);
    // relevance alone would order (1, 2, 3).
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.936f, 0.352f)),
      (2L, Seq(0.936f, 0.352f)),
      (3L, Seq(0.936f, -0.352f))).toDF("vec_id", "embedding")
    val out = rowsOf(Mmr.mmrOf(e))
    assert(out(1L) == 1L) // top relevance, tie-break by vec_id
    assert(out(2L) == 3L) // the diverse one, not the duplicate
    assert(out(3L) == 2L)
  }

  test("X122: real corpus equals the exact greedy replay") {
    def dotQ(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) =>
        math.floor(x.toDouble * y.toDouble * 1e15).toLong }.sum.toDouble
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotQ(a, b) / (math.sqrt(dotQ(a, a)) * math.sqrt(dotQ(b, b)))

    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = vecs(0L)
    val cand = vecs.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, q)) }
      .sortBy { case (id, rel) => (-rel, id) }
      .take(Mmr.C)
    var selected = Vector(cand.head._1)
    var ranks = Map(1L -> cand.head._1)
    (2 to Mmr.R).foreach { r =>
      val pick = cand.filterNot(c => selected.contains(c._1))
        .map { case (id, rel) =>
          val smax = selected.map(s => cos(vecs(id), vecs(s))).max
          (id, 0.5 * rel - 0.5 * smax)
        }
        .sortBy { case (id, mmr) => (-mmr, id) }
        .head._1
      selected :+= pick
      ranks += (r.toLong -> pick)
    }
    val got = rowsOf(Mmr.mmrRerank(spark, sfDir))
    assert(got == ranks)
    // the greedy picks must not simply be the relevance top-R
    // (otherwise the spec proves nothing about diversification) —
    // if they coincide on this corpus the crafted test above still
    // covers the demotion branch, so only sanity-check the shape here
    assert(got.size == Mmr.R)
  }
}
