package graft

import graft.ops.Triangles

/** X81 — degree-oriented triangle counting: crafted graphs with known
  * motif structure, brute-force equality on the real edge set, and the
  * once-per-triangle accounting identity.
  */
class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def statsOf(edges: Seq[(String, String)]) =
    Triangles.triangleStatsFromEdges(edges.toDF("u", "v")).collect()
      .map(r => r.getAs[String]("w") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri"),
          r.getAs[Double]("clust_q"))))
      .toMap

  test("X81: K4 — every node in 3 triangles, clustering 1.0") {
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    val got = statsOf(k4)
    assert(got.keySet == Set("a", "b", "c", "d"))
    got.values.foreach { case (deg, tri, clust) =>
      assert(deg == 3L && tri == 3L && clust == 1.0)
    }
  }

  test("X81: triangle + pendant + square — exact per-node counts") {
    // triangle {a,b,c}; pendant d hanging off a; square {p,q,r,s}
    // (4-cycle, no triangles)
    val g = Seq("a" -> "b", "a" -> "c", "b" -> "c", "a" -> "d",
      "p" -> "q", "q" -> "r", "r" -> "s", "p" -> "s")
    val got = statsOf(g)
    // d has degree 1 -> excluded (deg >= 2 filter)
    assert(!got.contains("d"))
    assert(got("a") == ((3L, 1L, 2.0 / 6.0)))
    assert(got("b") == ((2L, 1L, 1.0)))
    assert(got("c") == ((2L, 1L, 1.0)))
    Seq("p", "q", "r", "s").foreach { n =>
      assert(got(n) == ((2L, 0L, 0.0)))
    }
  }

  test("X81: skewed hub — oriented counts equal brute force") {
    // hub h connected to x0..x19, plus chained x_i - x_{i+1} edges:
    // 19 triangles (h, x_i, x_{i+1}); a naive unoriented neighbor
    // self-join would generate 20^2 wedges at h, orientation caps it
    val spokes = (0 until 20).map(i => "h" -> f"x$i%02d")
    val chain = (0 until 19).map(i => f"x$i%02d" -> f"x${i + 1}%02d")
    val edges = spokes ++ chain
    val got = statsOf(edges)
    // brute force over all node triples
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val eset = edges.map { case (a, b) =>
      if (a < b) (a, b) else (b, a)
    }.toSet
    val triOf = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.size
      k <- (j + 1) until nodes.size
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if eset((a, b)) && eset((a, c)) && eset((b, c))
    } Seq(a, b, c).foreach(n => triOf(n) += 1L)
    val degOf = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = degOf.collect { case (n, d) if d >= 2 =>
      n -> ((d, triOf(n), 2.0 * triOf(n) / (d * (d - 1.0))))
    }.toMap
    assert(got == expected)
    assert(got("h")._2 == 19L)
  }

  test("X81: real corpus equals brute force on the derived edge set") {
    val edges = Triangles.edgesOf(Tables.documents(spark, sfDir))
      .collect().map(r => (r.getAs[String]("u"), r.getAs[String]("v")))
    assert(edges.nonEmpty, "co-occurrence graph must be non-trivial")
    val eset = edges.toSet
    val adj = edges.flatMap { case (u, v) => Seq(u -> v, v -> u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val triOf = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    for {
      (u, v) <- edges
      w <- adj(u) if w > v && eset((v, w))
    } Seq(u, v, w).foreach(n => triOf(n) += 1L)
    val got = Triangles.triangleStats(spark, sfDir).collect()
      .map(r => r.getAs[String]("w") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_tri")))).toMap
    val degOf = edges.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = degOf.collect { case (n, d) if d >= 2 =>
      n -> ((d, triOf(n)))
    }.toMap
    assert(got == expected)
    // accounting identity: Σ per-node = 3 × distinct triangles
    assert(got.valuesIterator.map(_._2).sum % 3 == 0)
  }
}
