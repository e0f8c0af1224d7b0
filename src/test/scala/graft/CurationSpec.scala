package graft

import graft.ops.Curation

/** X22 — the composed curation pass: every verdict class exercised
  * deterministically on synthetic docs (the sf0.01 corpus has no exact
  * dups, so that branch is pinned here), plus invariants on the real
  * testdata. Engine parity is the oracle's job.
  */
class CurationSpec extends SparkSpec {

  test("X22: each verdict class resolves as designed on a synthetic corpus") {
    import spark.implicits._
    // ≥8-char words, no stopwords → quality ≈ 0.5·(n/100) + 0.3 + 0.2
    def words(prefix: String, n: Int): String =
      (1 to n).map(i => f"$prefix$i%04dpad").mkString(" ")
    val nearA = words("alpha", 40)                     // 40 words, quality 0.7
    val nearB = words("alpha", 38) + " omegaXXXX"      // 39 words, shares 36
    val exact = words("bravo", 40)                     // of A's 38 shingles
    val docs = Seq(
      1 -> "the the the the",  // 4 tokens, all stopwords → quality ≈ 0.1
      10 -> nearA,
      11 -> nearB,
      20 -> exact,
      21 -> exact,             // identical content, higher doc_id
      30 -> words("charlie", 40)
    ).toDF("doc_id", "text")
    val out = Curation.curationOf(docs).collect()
      .map(r => r.getAs[Int]("doc_id") ->
        (r.getAs[String]("verdict"), Option(r.getAs[Any]("cluster_id"))))
      .toMap
    assert(out(1) == ("low_quality", None))
    assert(out(10) == ("kept", Some(10)))
    assert(out(11) == ("near_dup", Some(10))) // loses on quality to doc 10
    assert(out(20) == ("kept", Some(20)))
    assert(out(21) == ("exact_dup", None))    // loses on doc_id to doc 20
    assert(out(30) == ("kept", Some(30)))     // singleton cluster
  }

  test("X22: verdicts partition the corpus and keep exactly one doc per cluster") {
    val rows = Curation.curationPipeline(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    val byVerdict = rows.groupBy(_.getAs[String]("verdict"))
    assert(byVerdict.keySet.subsetOf(
      Set("kept", "low_quality", "exact_dup", "near_dup")))
    assert(byVerdict.contains("kept") && byVerdict.contains("low_quality"))
    // every cluster that reached the decision stage keeps exactly one doc
    val clustered = rows.filter(r => !r.isNullAt(r.fieldIndex("cluster_id")))
    clustered.groupBy(_.getAs[Long]("cluster_id")).foreach { case (cid, members) =>
      assert(members.count(_.getAs[String]("verdict") == "kept") == 1,
        s"cluster $cid must keep exactly one canonical doc")
    }
    // kept + dropped reasons cover everything; no doc is unaccounted for
    assert(rows.forall(r => r.getAs[String]("verdict") != null))
  }
}
