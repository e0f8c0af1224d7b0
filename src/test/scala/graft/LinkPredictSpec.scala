package graft

import graft.ops.{CorpusIndex, LinkPredict}

/** X103 — common-neighbor link prediction: hand-traced graph fixtures
  * (4-cycle, single-wedge floor, adjacency exclusion) and a full
  * driver-side brute-force replay on the real collocation graph.
  */
class LinkPredictSpec extends SparkSpec {

  import spark.implicits._

  private def edges(es: (String, String)*) =
    es.map { case (a, b) => if (a < b) (a, b) else (b, a) }
      .distinct.toDF("u", "v")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getString(1)) ->
      ((r.getAs[Long]("deg_u"), r.getAs[Long]("deg_v"),
        r.getAs[Long]("n_common"), r.getAs[Double]("jacc_q")))).toMap

  test("X103: 4-cycle predicts exactly its two diagonals") {
    // a-b-c-d-a: (a,c) share {b,d}, (b,d) share {a,c}; all degrees 2,
    // union = 2+2-2 = 2 → jacc exactly 1.0 for both diagonals
    val out = rowsOf(LinkPredict.linkPredictFromEdges(
      edges("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "d")))
    assert(out == Map(
      ("a", "c") -> ((2L, 2L, 2L, 1.0)),
      ("b", "d") -> ((2L, 2L, 2L, 1.0))))
  }

  test("X103: a single shared neighbor stays below the evidence floor") {
    // path a-b-c: (a,c) share only {b} → n_common = 1 < MinCommon
    val out = LinkPredict.linkPredictFromEdges(
      edges("a" -> "b", "b" -> "c"))
    assert(out.count() == 0)
  }

  test("X103: adjacent pairs are excluded even with enough overlap") {
    // K4 minus nothing: every pair is adjacent, every pair shares the
    // other two vertices — 2 ≥ MinCommon, yet nothing predicts
    val k4 = edges("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    assert(LinkPredict.linkPredictFromEdges(k4).count() == 0)
    // drop edge (c,d): the pair becomes non-adjacent and surfaces with
    // its shared {a,b}; c and d each keep exactly {a,b} as neighborhood
    // → deg 2, union 2 → jacc exactly 1.0 (perfect substitutability)
    val out = rowsOf(LinkPredict.linkPredictFromEdges(
      edges("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d")))
    assert(out == Map(("c", "d") -> ((2L, 2L, 2L, 1.0))))
  }

  test("X103: real collocation graph equals the brute-force replay") {
    val es = CorpusIndex.collocationEdges(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val adj = es.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val edgeSet = es.toSet
    val nodes = adj.keys.toSeq.sorted
    val expected = (for {
      i <- nodes.indices
      j <- (i + 1) until nodes.size
      u = nodes(i); v = nodes(j)
      if !edgeSet.contains((u, v))
      nc = (adj(u) & adj(v)).size.toLong
      if nc >= LinkPredict.MinCommon
    } yield (u, v) -> ((adj(u).size.toLong, adj(v).size.toLong, nc,
      nc.toDouble / (adj(u).size + adj(v).size - nc).toDouble))).toMap
    assert(rowsOf(LinkPredict.linkPredict(spark, sfDir)) == expected)
    assert(expected.nonEmpty) // fixture guard: the corpus graph predicts
  }
}
