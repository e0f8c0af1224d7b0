package graft

import graft.ops.Vector

/** X87 — mutual k-NN graph: crafted reciprocity fixture at k=1, exact
  * driver-side replay of the full quantized pipeline on the real
  * embeddings, and the structural canonical-pair invariants.
  */
class MutualKnnSpec extends SparkSpec {

  import spark.implicits._

  /** The op's arithmetic, replayed in plain Scala: quantized dot
    * Σ floor(aᵢ·bᵢ·1e15) as i64 → double; cos = dq/(√na·√nb).
    */
  private def dq(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double =
    a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e15).toLong
    }.sum.toDouble

  private def cos(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double =
    dq(a, b) / (math.sqrt(dq(a, a)) * math.sqrt(dq(b, b)))

  private def refMutual(
      vecs: Seq[(Long, Any, scala.collection.Seq[Float])], k: Int) = {
    val byLabel = vecs.groupBy(_._2)
    val directed = byLabel.values.flatMap { block =>
      block.flatMap { case (ida, _, ea) =>
        block.filter(_._1 != ida)
          .map { case (idb, _, eb) => (idb, cos(ea, eb)) }
          .sortBy { case (idb, c) => (-c, idb) }
          .take(k).zipWithIndex
          .map { case ((idb, c), i) => (ida, idb) -> ((c, i + 1L)) }
      }
    }.toMap
    directed.collect {
      case ((a, b), (c, rkAb)) if a < b && directed.contains((b, a)) =>
        (a, b) -> ((c, rkAb, directed((b, a))._2))
    }
  }

  test("X87: k=1 — tight pairs are mutual, the outlier is not") {
    // two near-parallel pairs + one vector nearest to p1 whose own
    // nearest (p1) prefers p2: mutual at k=1 only within the pairs
    val vecs = Seq(
      (1L, "a", Seq(1.0f, 0.0f, 0.0f)),
      (2L, "a", Seq(0.99f, 0.14f, 0.0f)),
      (3L, "a", Seq(0.0f, 1.0f, 0.0f)),
      (4L, "a", Seq(0.14f, 0.99f, 0.0f)),
      (5L, "a", Seq(0.6f, 0.6f, 0.52f)))
    val got = Vector.mutualKnnOf(
      vecs.toDF("vec_id", "label", "embedding"), 1).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(got.toSet == Set((1L, 2L), (3L, 4L)))
    assert(refMutual(vecs, 1).keySet == Set((1L, 2L), (3L, 4L)))
  }

  test("X87: real embeddings equal the exact quantized replay") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.get(1),
        r.getAs[scala.collection.Seq[Float]]("embedding")))
      .toSeq
    val expected = refMutual(vecs, Vector.MutualK)
    val got = Vector.mutualKnn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")) ->
        ((r.getAs[Double]("cos_sim"), r.getAs[Long]("rank_ab"),
          r.getAs[Long]("rank_ba"))))
      .toMap
    assert(got.nonEmpty, "mutual graph must be non-trivial on the corpus")
    assert(got.keySet == expected.keySet)
    got.foreach { case (pair, (c, rab, rba)) =>
      assert(c == expected(pair)._1, s"cos mismatch at $pair")
      assert(rab == expected(pair)._2 && rba == expected(pair)._3,
        s"rank mismatch at $pair")
    }
  }

  test("X87 scale path: IVF-fed mutual recall rises with the probe " +
      "and clears 0.75 at nprobe=8") {
    // exact GLOBAL truth (no label blocking — the scale path searches
    // the whole corpus): refMutual with one constant block key
    val idx = graft.ops.Vector.ivfIndex(spark, sfDir)
    val vecs = idx.assigned.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), "g": Any,
        r.getAs[scala.collection.Seq[Float]]("embedding"))).toSeq
    val exact = refMutual(vecs, graft.ops.Vector.MutualK).keySet
    def annRecall(nprobe: Int): Double = {
      val pairs = graft.ops.Vector.mutualFromDirected(
        graft.ops.Vector.ivfDirectedKnn(idx, nprobe,
          graft.ops.Vector.MutualK)).collect()
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      (exact & pairs).size.toDouble / exact.size
    }
    def symRecall(nprobe: Int): Double = {
      val pairs = graft.ops.Vector.mutualFromDirected(
        graft.ops.Vector.ivfDirectedKnnSym(idx, nprobe,
          graft.ops.Vector.MutualK)).collect()
        .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
      (exact & pairs).size.toDouble / exact.size
    }
    val r2 = annRecall(2)
    val r8 = annRecall(8)
    info(f"mutual recall vs exact global: nprobe=2 -> $r2%.3f, nprobe=8 -> $r8%.3f")
    // round-10 sweep (verdict item 6): deeper probes + the residual
    // symmetrization (either-direction candidates rerank exactly at
    // both endpoints), which un-squares the reciprocity penalty
    Seq(2, 4, 8, 12, 16).foreach { np =>
      info(f"sweep nprobe=$np%2d: plain -> ${annRecall(np)}%.3f, " +
        f"sym -> ${symRecall(np)}%.3f")
    }
    val s8 = symRecall(8)
    assert(r8 > r2, "a deeper probe must not lose mutual pairs here")
    // reciprocity squares the directed miss rate, so the mutual floor
    // needs a deeper probe than top-k recall (ANN_SWEEP's caveat)
    assert(r8 >= 0.75, f"nprobe=8 mutual recall $r8%.3f under floor")
    assert(s8 >= r8,
      "symmetrization can only ADD candidates to each rerank pool")
    // measured round 10: sym ≥ 0.9 at nprobe=8 on this corpus (the
    // production operating point ANN_SWEEP documents)
    assert(s8 >= 0.9, f"nprobe=8 SYM mutual recall $s8%.3f under floor")
  }

  test("X87: every pair is canonical and reciprocity is symmetric-free") {
    val rows = Vector.mutualKnn(spark, sfDir).collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b")))
    assert(pairs.forall { case (a, b) => a < b })
    assert(pairs.distinct.length == pairs.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("rank_ab") <= Vector.MutualK &&
        r.getAs[Long]("rank_ba") <= Vector.MutualK)
    }
  }
}
