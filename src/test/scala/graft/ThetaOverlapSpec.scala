package graft

import org.apache.spark.sql.DataFrame

import graft.ops.ThetaOverlap

/** X137 — theta-sketch pairwise overlap: losslessness below capacity,
  * the hand-computed above-capacity fixture (θ, counts, every
  * estimate), the K-bounded-state law (pair estimates are a function
  * of the sketches alone), partition-count invariance, and the exact
  * driver-side replay of the whole pair matrix on the real corpus.
  */
class ThetaOverlapSpec extends SparkSpec {

  import spark.implicits._

  private val H = ThetaOverlap.H
  private val K = ThetaOverlap.K

  private def byPair(df: DataFrame) =
    df.collect().map(r =>
      (r.getAs[String]("grp_a"), r.getAs[String]("grp_b")) -> r).toMap

  test("X137: below capacity every estimate is exact") {
    val items = ((1L to 30L).map(("a", _)) ++ (20L to 45L).map(("b", _)))
      .toDF("grp", "h")
    val r = byPair(ThetaOverlap.pairsOf(items))(("a", "b"))
    assert(r.getAs[Long]("theta") == H)
    assert(r.getAs[Long]("nd_a") == 30L && r.getAs[Long]("nd_b") == 26L)
    assert(r.getAs[Long]("both_below") == 11L)
    assert(r.getAs[Long]("either_below") == 45L)
    assert(r.getAs[Long]("exact_inter") == 11L)
    assert(r.getAs[Long]("exact_union") == 45L)
    assert(r.getAs[Double]("est_inter") == 11.0)
    assert(r.getAs[Double]("est_union") == 45.0)
    assert(r.getAs[Double]("est_jaccard") == 11.0 / 45.0)
  }

  test("X137: above capacity matches the hand-computed theta algebra") {
    // A = even numbers ≤ 1200, B = multiples of 3 ≤ 1800 → both above
    // K = 256: θ_a = 512 (256th even), θ_b = 768, θ = 512;
    // below θ: evens 2..510 → 255, triples 3..510 → 170,
    // multiples of 6 ≤ 510 → 85; exact: inter 200, union 1000
    val items = ((1L to 600L).map(i => ("a", i * 2)) ++
      (1L to 600L).map(i => ("b", i * 3))).toDF("grp", "h")
    val r = byPair(ThetaOverlap.pairsOf(items))(("a", "b"))
    assert(r.getAs[Long]("theta") == 512L)
    assert(r.getAs[Long]("nd_a") == 600L && r.getAs[Long]("nd_b") == 600L)
    assert(r.getAs[Long]("both_below") == 85L)
    assert(r.getAs[Long]("either_below") == 340L)
    assert(r.getAs[Double]("est_jaccard") == 85.0 / 340.0)
    assert(r.getAs[Double]("est_inter") == 85.0 * H / 512.0)
    assert(r.getAs[Double]("est_union") == 340.0 * H / 512.0)
    assert(r.getAs[Long]("exact_inter") == 200L)
    assert(r.getAs[Long]("exact_union") == 1000L)
    // the ratio estimator should sit near the true Jaccard 0.2
    assert(math.abs(r.getAs[Double]("est_jaccard") - 0.2) < 0.1)
  }

  test("X137: pair estimates are a function of the K-row sketches alone") {
    val items = ThetaOverlap.itemsOf(spark, sfDir)
    val (sketch, _) = ThetaOverlap.sketchOf(items)
    val fromFull = ThetaOverlap.pairsOf(items).drop(
      "exact_inter", "exact_union").collect().map(_.toString).sorted
    val fromSketch = ThetaOverlap.pairsOf(sketch.select($"grp", $"h"))
      .drop("exact_inter", "exact_union").collect()
      .map(_.toString).sorted
    // nd differs above capacity (the sketch forgets it), so compare on
    // the estimate columns only when any source exceeds K — below K
    // the full rows must match verbatim
    val nds = items.groupBy($"grp").count().collect()
      .map(_.getAs[Long]("count"))
    if (nds.forall(_ <= K)) assert(fromFull.toSeq == fromSketch.toSeq)
    else {
      val cols = Seq("grp_a", "grp_b", "theta", "both_below",
        "either_below", "est_jaccard", "est_inter", "est_union")
      val f = ThetaOverlap.pairsOf(items)
        .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
      val s = ThetaOverlap.pairsOf(sketch.select($"grp", $"h"))
        .select(cols.head, cols.tail: _*).collect().map(_.toString).sorted
      assert(f.toSeq == s.toSeq,
        "estimates must be derivable from the K-row sketches alone")
    }
  }

  test("X137: partition-count invariance") {
    val items = ThetaOverlap.itemsOf(spark, sfDir)
    val one = ThetaOverlap.pairsOf(items).collect().map(_.toString).toSeq
    val seven = ThetaOverlap.pairsOf(items.repartition(7))
      .collect().map(_.toString).toSeq
    assert(one == seven)
  }

  test("X137: real corpus equals the exact driver-side replay") {
    val items = ThetaOverlap.itemsOf(spark, sfDir).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("h")))
    val sets = items.groupBy(_._1).map { case (g, xs) =>
      g -> xs.map(_._2).toSet
    }
    val grps = sets.keys.toSeq.sorted
    val got = byPair(ThetaOverlap.thetaOverlap(spark, sfDir))
    val pairs = for {
      i <- grps.indices; j <- (i + 1) until grps.length
    } yield (grps(i), grps(j))
    assert(got.keySet == pairs.toSet)
    pairs.foreach { case (a, b) =>
      val (sa, sb) = (sets(a), sets(b))
      def theta(s: Set[Long]): Long =
        if (s.size >= K) s.toSeq.sorted.apply(K - 1) else H
      val th = math.min(theta(sa), theta(sb))
      val below = (s: Set[Long]) => s.count(_ < th).toLong
      val both = sa.intersect(sb).count(_ < th).toLong
      val either = below(sa) + below(sb) - both
      val r = got((a, b))
      assert(r.getAs[Long]("nd_a") == sa.size.toLong, s"$a-$b nd_a")
      assert(r.getAs[Long]("nd_b") == sb.size.toLong, s"$a-$b nd_b")
      assert(r.getAs[Long]("theta") == th, s"$a-$b theta")
      assert(r.getAs[Long]("both_below") == both, s"$a-$b both")
      assert(r.getAs[Long]("either_below") == either, s"$a-$b either")
      assert(r.getAs[Double]("est_jaccard") ==
        both.toDouble / either.toDouble, s"$a-$b est_jaccard")
      assert(r.getAs[Double]("est_inter") ==
        (both * H).toDouble / th.toDouble, s"$a-$b est_inter")
      assert(r.getAs[Double]("est_union") ==
        (either * H).toDouble / th.toDouble, s"$a-$b est_union")
      assert(r.getAs[Long]("exact_inter") ==
        sa.intersect(sb).size.toLong, s"$a-$b exact_inter")
      assert(r.getAs[Long]("exact_union") ==
        sa.union(sb).size.toLong, s"$a-$b exact_union")
    }
  }
}
