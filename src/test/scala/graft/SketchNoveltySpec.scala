package graft

import org.apache.spark.sql.DataFrame

import graft.ops.SketchNovelty

/** X148 — sketch-estimated snapshot novelty: below-capacity
  * losslessness (est ≡ exact), identical snapshots ⇒ zero novelty both
  * ways, disjoint snapshots ⇒ novelty = full size, the union-merge law
  * against a direct union sketch on the corpus, and partition
  * invariance.
  */
class SketchNoveltySpec extends SparkSpec {

  import spark.implicits._

  private def frame(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "source", "text")

  test("X148: below capacity, estimates equal the exact audits") {
    val a = frame((1L to 30L).map(i => (i, "s", s"doc-$i")))
    val b = frame((11L to 40L).map(i => (i, "s", s"doc-$i")))
    val r = SketchNovelty.noveltyOf(a, b).collect()(0)
    assert(r.getAs[Long]("n_a") == 30L && r.getAs[Long]("n_b") == 30L)
    assert(r.getAs[Long]("exact_new") == 10L)
    assert(r.getAs[Long]("exact_removed") == 10L)
    assert(r.getAs[Double]("est_new") == 10.0,
      "below capacity the sketch delta must be exact")
    assert(r.getAs[Double]("est_removed") == 10.0)
    assert(r.getAs[Double]("est_u") == 40.0)
  }

  test("X148: identical snapshots estimate zero novelty") {
    val a = frame((1L to 200L).map(i => (i, "s", s"doc-$i")))
    val r = SketchNovelty.noveltyOf(a, a).collect()(0)
    assert(r.getAs[Long]("exact_new") == 0L)
    assert(r.getAs[Double]("est_new") == 0.0,
      "union sketch of identical sides must equal each side's sketch")
    assert(r.getAs[Double]("est_removed") == 0.0)
  }

  test("X148: disjoint below-capacity snapshots — novelty is the full side") {
    val a = frame((1L to 20L).map(i => (i, "s", s"alpha-$i")))
    val b = frame((1L to 25L).map(i => (i, "s", s"beta-$i")))
    val r = SketchNovelty.noveltyOf(a, b).collect()(0)
    assert(r.getAs[Double]("est_new") == 20.0)
    assert(r.getAs[Double]("est_removed") == 25.0)
  }

  test("X148: stored-sketch merge equals a direct sketch of the union") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val snapB = graft.ops.SnapshotDiff.snapshotB(docs)
    val out = SketchNovelty.noveltyOf(docs, snapB)
      .select($"grp", $"k_u", $"est_u").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // direct union-stream sketch via the X134 window path
    val unionStream = docs.select($"source".as("grp"), $"text".as("v"))
      .unionByName(snapB.select($"source".as("grp"), $"text".as("v")))
    val direct = graft.ops.Kmv.kmvOf(unionStream)
      .select($"grp", $"k_used", $"est_q").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == direct.keySet)
    out.foreach { case (g, (k, est)) =>
      assert((k, est) == direct(g),
        s"source $g: merged sketch ($k, $est) != direct ${direct(g)}")
    }
  }

  test("X148: a source present in only one snapshot still reports") {
    // a brand-new feed: in A, absent from B entirely
    val a = frame((1L to 15L).map(i => (i, "newfeed", s"doc-$i")) ++
      (100L to 110L).map(i => (i, "old", s"stable-$i")))
    val b = frame((100L to 110L).map(i => (i, "old", s"stable-$i")))
    val rows = SketchNovelty.noveltyOf(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    val nf = rows("newfeed")
    assert(nf.getAs[Long]("n_b") == 0L)
    assert(nf.getAs[Long]("exact_new") == 15L)
    assert(nf.getAs[Long]("exact_removed") == 0L)
    assert(nf.getAs[Long]("k_u") == 15L,
      "the union sketch must be A's sketch when B is empty")
    // the estimate columns must report the novelty, not null-coalesce
    // it away: a brand-new feed's est_new is the whole union estimate
    // (empty B sketch ⇒ est_b = 0.0 — round-12 advice fix)
    assert(nf.getAs[Long]("k_b") == 0L)
    assert(nf.getAs[Double]("est_b") == 0.0)
    assert(nf.getAs[Double]("est_new") == nf.getAs[Double]("est_u"),
      "new-feed est_new must equal est_u (est_b is the empty sketch)")
    assert(nf.getAs[Double]("est_new") == 15.0)
    assert(nf.getAs[Double]("est_removed") == 0.0)
    val old = rows("old")
    assert(old.getAs[Long]("exact_new") == 0L)
    assert(old.getAs[Double]("est_new") == 0.0)
  }

  test("X148: a vanished feed reports its removal estimate") {
    // present only in B (yesterday's feed that stopped): est_removed
    // must be est_u, not 0.0
    val a = frame((100L to 110L).map(i => (i, "old", s"stable-$i")))
    val b = frame((1L to 12L).map(i => (i, "gone", s"doc-$i")) ++
      (100L to 110L).map(i => (i, "old", s"stable-$i")))
    val rows = SketchNovelty.noveltyOf(a, b).collect()
      .map(r => r.getString(0) -> r).toMap
    val g = rows("gone")
    assert(g.getAs[Long]("n_a") == 0L)
    assert(g.getAs[Long]("exact_removed") == 12L)
    assert(g.getAs[Long]("k_a") == 0L)
    assert(g.getAs[Double]("est_a") == 0.0)
    assert(g.getAs[Double]("est_removed") == g.getAs[Double]("est_u"))
    assert(g.getAs[Double]("est_removed") == 12.0)
    assert(g.getAs[Double]("est_new") == 0.0)
  }

  test("X148: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"text")
    val snapB = graft.ops.SnapshotDiff.snapshotB(docs)
    val one = SketchNovelty.noveltyOf(docs, snapB)
      .collect().map(_.toString).toSeq
    val many = SketchNovelty.noveltyOf(docs.repartition(13),
      snapB.repartition(7)).collect().map(_.toString).toSeq
    assert(one == many)
  }
}
