package graft

import org.apache.spark.sql.functions._

import graft.ops.{ContaminationKmv, ContaminationMatrix, Kmv}

/** X176 — per-cell KMV estimate of the distinct shared grams: lossless
  * below capacity (est = X172's exact column by definition), within the
  * theoretical error band when saturated, invariant to partitioning
  * (the aggregator's merge is order-free), and completed to the full
  * matrix with the X172 zero-cell convention.
  */
class ContaminationKmvSpec extends SparkSpec {

  import spark.implicits._

  test("X176: below capacity the sketch is lossless — est equals X172's " +
    "exact distinct shared grams; the matrix is completed with zeros") {
    val est = ContaminationKmv.contaminationKmv(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.get(3), r.getDouble(4))).toMap
    val exact = ContaminationMatrix.contaminationMatrix(spark, sfDir)
      .select($"source", $"eval_set", $"n_shared_grams")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(est.keySet == exact.keySet,
      "both matrices complete to the same source x set cells")
    est.foreach { case (cell, (kUsed, kth, estQ)) =>
      val n = exact(cell)
      if (kUsed < Kmv.K) {
        assert(kUsed == n && estQ == n.toDouble,
          s"cell $cell under capacity must report the exact count " +
            s"(k_used=$kUsed est=$estQ exact=$n)")
        if (n == 0L) assert(kth == null,
          s"a clean cell carries no kth hash, got $kth")
      } else {
        assert(math.abs(estQ - n) / n <= 3.0 / math.sqrt(Kmv.K - 2.0),
          s"saturated cell $cell: est $estQ vs exact $n exceeds the 3x " +
            "1/sqrt(k-2) band")
      }
    }
  }

  test("X176: a planted verbatim leak lands in its cell with the exact " +
    "shared-gram count; clean cells report zero") {
    // doc 20 sits in eval_a (residue 0); doc 21 copies 8 of its words
    // verbatim -> 8 - 6 + 1 = 3 shared 6-grams; source s2 stays clean
    val text20 = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (20L, "s1", text20),
      (21L, "s1", text20 + " different tail here"),
      (22L, "s2", "one two three four five six seven eight"))
      .toDF("doc_id", "source", "text")
    val out = ContaminationKmv.kmvMatrixOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(4))).toMap
    assert(out(("s1", "eval_a")) == ((3L, 3.0)),
      "the 8 copied words at n = 6 share exactly 3 grams, all sketched")
    assert(out(("s2", "eval_a")) == ((0L, 0.0)))
    assert(out(("s1", "eval_b")) == ((0L, 0.0)),
      "no doc sits in eval_b's residue — its cells are clean by " +
        "construction")
  }

  test("X176: a saturated cell estimates within the error band and its " +
    "kth hash equals the X134 window form's order statistic") {
    // one eval doc of 120 distinct words -> 115 distinct 6-grams; one
    // training doc copies it verbatim -> 115 > K = 64 shared grams
    val words = (0 until 120).map(i => s"w$i").mkString(" ")
    val docs = Seq((20L, "s1", words), (21L, "s1", words))
      .toDF("doc_id", "source", "text")
    val row = ContaminationKmv.kmvMatrixOf(docs)
      .filter($"eval_set" === "eval_a" && $"source" === "s1")
      .collect().head
    assert(row.getLong(2) == Kmv.K.toLong, "the cell saturates")
    val est = row.getDouble(4)
    assert(math.abs(est - 115.0) / 115.0 <= 3.0 / math.sqrt(Kmv.K - 2.0),
      s"estimate $est for 115 true distinct shared grams is outside " +
        "the 3-sigma band")
    // independent recompute of the k-th smallest hash (the window form)
    val kth = graft.ops.Dedup.ngramsOf(docs.filter($"doc_id" === 21L), 6)
      .select(graft.functions.Hashing.md5Long40($"sh").as("h"))
      .distinct().orderBy($"h").limit(Kmv.K)
      .agg(max($"h")).collect().head.getLong(0)
    assert(row.getLong(3) == kth,
      "the aggregator's kth hash must equal the rank-window order " +
        "statistic on the same gram set")
  }

  test("X176: partition invariance — the sketch is a pure function of " +
    "the gram set, not the merge order") {
    val docs = Tables.documents(spark, sfDir)
    val a = ContaminationKmv.kmvMatrixOf(docs.repartition(1))
      .collect().map(_.toString).toSeq
    val b = ContaminationKmv.kmvMatrixOf(docs.repartition(32, $"source"))
      .collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("X176: registered query equals the seam identity") {
    val reg = SparkEntry.queries("x176_contamination_kmv")(spark, sfDir)
    assert(reg.columns.toSeq ==
      Seq("source", "eval_set", "k_used", "kth_hash", "est_q"))
    val seam = ContaminationKmv.kmvMatrixOf(Tables.documents(spark, sfDir))
    assert(reg.collect().map(_.toString).toSeq ==
      seam.collect().map(_.toString).toSeq)
  }
}
