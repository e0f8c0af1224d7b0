package graft

import graft.ops.{CorpusIndex, KCore}

/** X95 — k-core: crafted graphs with known cores (including a
  * multi-round cascade), the idempotence-past-fixpoint property that
  * makes the fixed-round unroll exact, and the fixpoint-margin probe on
  * the real collocation graph.
  */
class KCoreSpec extends SparkSpec {

  import spark.implicits._

  private def core(edges: Seq[(String, String)]) =
    KCore.kCoreFromEdges(edges.toDF("u", "v"))
      .as[(String, Long)].collect().toSeq

  test("X95: K4 survives as the 3-core, pendants peel") {
    // complete graph on {a,b,c,d} + pendant chain d—e—f
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"), ("d", "e"), ("e", "f"))
    assert(core(edges) ==
      Seq(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L)))
  }

  test("X95: peeling cascades across rounds") {
    // x has degree 3, but only via p/q/r which peel in round 1 (degree
    // 1 each) — x must fall in round 2, leaving only the K4
    val edges = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"),
      ("x", "p"), ("x", "q"), ("x", "r"))
    assert(core(edges).map(_._1) == Seq("a", "b", "c", "d"))
  }

  test("X95: an empty 3-core comes out empty, not an error") {
    // a cycle is 2-regular: nothing reaches degree 3
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"))
    assert(core(edges).isEmpty)
  }

  test("X95: real graph reaches its fixpoint well inside the round margin") {
    val counts = KCore.peelCounts(CorpusIndex.collocationEdges(spark, sfDir))
    assert(counts.length == KCore.Rounds)
    // converged = two consecutive identical survivor counts, with ≥2
    // idle rounds of margin before the unroll bound
    val stableAt = counts.zip(counts.tail).indexWhere { case (a, b) => a == b }
    assert(stableAt >= 0 && stableAt <= KCore.Rounds - 3,
      s"peel counts $counts did not stabilize within the margin")
    // idempotence past the fixpoint: the tail stays constant
    assert(counts.drop(stableAt).distinct.size == 1)
    // and every survivor satisfies the core invariant
    val survivors = KCore.kCore(spark, sfDir).as[(String, Long)].collect()
    assert(survivors.forall(_._2 >= KCore.CoreK))
  }
}
