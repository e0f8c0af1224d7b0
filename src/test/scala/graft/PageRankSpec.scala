package graft

import graft.ops.{PageRank, Triangles}

/** X84 — integer PageRank: exact equality against a driver-side
  * reference implementation of the same i64 recurrence (crafted graphs
  * + the real collocation edge set), plus the mass-conservation bound
  * that makes the truncation loss auditable.
  */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  /** The op's recurrence, replayed driver-side in plain Long
    * arithmetic (Scala `/` on nonnegative Longs IS truncating div).
    */
  private def refRanks(und: Seq[(String, String)]): Map[String, Long] = {
    val edges = und.flatMap { case (u, v) => Seq(u -> v, v -> u) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val n = deg.size
    var r = deg.keys.map(_ -> PageRank.Scale / n).toMap
    for (_ <- 1 to PageRank.Iters) {
      val contrib = scala.collection.mutable.Map
        .empty[String, Long].withDefaultValue(0L)
      for ((src, dst) <- edges) contrib(dst) += r(src) / deg(src)
      r = deg.keys.map(v => v ->
        ((15L * (PageRank.Scale / n)) / 100L
          + (85L * contrib(v)) / 100L)).toMap
    }
    r
  }

  private def runOn(und: Seq[(String, String)]) =
    PageRank.pagerankFromEdges(und.toDF("u", "v")).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("rank_i"), r.getAs[Long]("deg"),
          r.getAs[Double]("rank_q"))))
      .toMap

  test("X84: star + tail — hub outranks spokes, exact i64 equality") {
    // star h-{s0..s4} plus tail s0-t: h ranks highest; the pure
    // spokes s1..s4 rank lowest (h splits its mass 5 ways while s0
    // passes t a full half) — graph position, not raw degree
    val und = (0 until 5).map(i => "h" -> s"s$i") :+ ("s0" -> "t")
    val got = runOn(und)
    val ref = refRanks(und)
    assert(got.keySet == ref.keySet)
    got.foreach { case (v, (ri, _, rq)) =>
      assert(ri == ref(v), s"rank_i mismatch at $v")
      assert(rq == ri.toDouble / PageRank.Scale.toDouble)
    }
    assert(got("h")._1 == got.values.map(_._1).max)
    val spoke = got("s1")._1
    assert(Seq("s2", "s3", "s4").forall(got(_)._1 == spoke))
    assert(spoke == got.values.map(_._1).min)
    assert(got("t")._1 > spoke, "tail outranks spokes via s0's split")
    assert(got("h")._2 == 5L && got("t")._2 == 1L)
  }

  test("X84: symmetric cycle — uniform degrees keep ranks uniform") {
    val und = (0 until 6).map(i => s"c$i" -> s"c${(i + 1) % 6}")
      .map { case (a, b) => if (a < b) (a, b) else (b, a) }
    val got = runOn(und)
    assert(got.values.map(_._1).toSet.size == 1,
      "cycle ranks must be identical")
    assert(got == refRanks(und).map { case (v, r) =>
      v -> ((r, 2L, r.toDouble / PageRank.Scale.toDouble)) })
  }

  test("X84: real collocation graph equals the driver-side replay") {
    val und = Triangles.edgesOf(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getAs[String]("u"), r.getAs[String]("v")))
      .toSeq
    assert(und.nonEmpty, "collocation graph must be non-trivial")
    val got = runOn(und)
    val ref = refRanks(und)
    assert(got.keySet == ref.keySet)
    got.foreach { case (v, (ri, _, _)) => assert(ri == ref(v)) }
    // truncation drops < 1 unit per integral division: n initial +
    // per round 2m contribs + 2 per-node damping divs — tiny vs Scale
    val m = und.size.toLong
    val n = ref.size.toLong
    val total = got.values.map(_._1).sum
    assert(total <= PageRank.Scale)
    assert(PageRank.Scale - total <=
      n + PageRank.Iters * (2 * m + 2 * n + 2))
  }
}
