package graft

import org.apache.spark.sql.functions._

import graft.ops.{AmsF2, JoinSize}

/** X159 — AMS join size: a single shared value estimates EXACTLY
  * (every counter agrees in sign), disjoint groups estimate near zero,
  * the sketch inner product tracks the exact join on the corpus, the
  * linear merge law holds (sketch of a union = counter-wise sum), and
  * the estimate is partition-invariant.
  */
class JoinSizeSpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(String, String)]) =
    rows.toDF("grp", "v")

  test("X159: one shared value with multiplicities estimates exactly") {
    // A has 'dup' ×3, B has 'dup' ×5 — join size 15; every counter is
    // (±3)·(±5) with MATCHING signs ⇒ every product = 15 ⇒ est exact
    val rows = frame(
      Seq.fill(3)(("a", "dup")) ++ Seq.fill(5)(("b", "dup")))
    val r = JoinSize.joinSizeOf(rows).collect()(0)
    assert(r.getAs[Long]("n_a") == 3L && r.getAs[Long]("n_b") == 5L)
    assert(r.getAs[Long]("exact_join") == 15L)
    assert(r.getAs[Long]("est_join") == 15L,
      "a single shared value must estimate exactly")
  }

  test("X159: empty join estimates near zero, never reported as missing") {
    val rows = frame(
      (1 to 40).map(i => ("a", s"alpha-$i")) ++
        (1 to 40).map(i => ("b", s"beta-$i")))
    val r = JoinSize.joinSizeOf(rows).collect()(0)
    assert(r.getAs[Long]("exact_join") == 0L)
    // cross terms of independent ±1 signs: |est| ≪ n_a·n_b
    assert(math.abs(r.getAs[Long]("est_join")) < 400L,
      s"disjoint sides estimated ${r.get(4)}")
  }

  test("X159: corpus estimates track the exact joins") {
    val out = JoinSize.joinSizeAms(spark, sfDir).collect()
    val nSources = Tables.documents(spark, sfDir)
      .select($"source").distinct().count()
    assert(out.length == nSources * (nSources - 1) / 2,
      "every source pair must report")
    // aggregate accuracy: the summed estimate lands within the AMS
    // error band of the summed truth (per-pair stderr ≈ √(2/R)·√(F2aF2b));
    // at this SF the sources share no byte-identical text (exact = 0 is
    // itself the right answer) — the estimate must then sit inside the
    // zero-join noise band, far from the ~250² of a real overlap
    val est = out.map(_.getAs[Long]("est_join")).sum.toDouble
    val exact = out.map(_.getAs[Long]("exact_join")).sum.toDouble
    assert(math.abs(est - exact) <= math.max(500.0, 2.0 * exact),
      s"est=$est exact=$exact")
  }

  test("X159: the sketch is linear — union sketches by vector addition") {
    val a = frame((1 to 30).map(i => ("g", s"w-${i % 7}")))
    val b = frame((1 to 20).map(i => ("g", s"w-${i % 5}")))
    val both = AmsF2.sketchOf(a.unionByName(b)).collect()(0)
    val sa = AmsF2.sketchOf(a).collect()(0)
    val sb = AmsF2.sketchOf(b).collect()(0)
    (0 until AmsF2.R).foreach { r =>
      assert(both.getAs[Long](s"x$r") ==
        sa.getAs[Long](s"x$r") + sb.getAs[Long](s"x$r"),
        s"counter x$r must add linearly")
    }
  }

  test("X159: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
      .select($"source".as("grp"), $"text".as("v"))
    val one = JoinSize.joinSizeOf(docs).collect().map(_.toString).toSeq
    val many = JoinSize.joinSizeOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
