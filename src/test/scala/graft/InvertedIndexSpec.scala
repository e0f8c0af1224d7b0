package graft

import graft.ops.InvertedIndex

/** X43 — inverted index: postings semantics on a hand-built corpus,
  * plus the two plan properties that make it scale: the map-side
  * WindowGroupLimit cap on hot terms and the single reused term
  * partitioning after the (term, doc) combine.
  */
class InvertedIndexSpec extends SparkSpec {

  test("X43: df/tf/postings semantics on a known corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "apple cherry"),
      (3L, "banana apple banana banana"),
      (4L, "apple date")
    ).toDF("doc_id", "text")
    val rows = InvertedIndex.indexOf(docs, minDf = 2, postK = 2).collect()
    val byTerm = rows.map(r => r.getAs[String]("term") ->
      ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"),
        r.getAs[String]("postings")))).toMap
    // apple: in all 4 docs, 5 occurrences; top-2 postings by tf desc,
    // doc_id asc = doc 1 (tf 2) then doc 2 (tf 1, lowest id of the ties)
    assert(byTerm("apple") == ((4L, 5L, "[1,2]")))
    // banana: docs 1 and 3; doc 3 has tf 3 so it leads
    assert(byTerm("banana") == ((2L, 4L, "[3,1]")))
    // cherry/date have df 1 < minDf ⇒ filtered out
    assert(!byTerm.contains("cherry") && !byTerm.contains("date"))
  }

  test("X43: postings are capped at postK and ordered by tf then doc") {
    val rows = InvertedIndex.invertedIndex(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ids = r.getAs[String]("postings").stripPrefix("[")
        .stripSuffix("]").split(",").map(_.trim.toLong)
      assert(ids.length <= InvertedIndex.PostK)
      assert(ids.distinct.length == ids.length)
      assert(ids.length == math.min(r.getAs[Long]("df"), InvertedIndex.PostK.toLong),
        s"term ${r.getAs[String]("term")}: postings shorter than min(df, K)")
    }
  }

  test("X43: tf is shared, the hot-term cap is map-side, branches add one term exchange each") {
    val plan = InvertedIndex.invertedIndex(spark, sfDir)
      .queryExecution.executedPlan.toString
    // tf is materialized once (localCheckpoint since round 16 — an RDD
    // scan, not an InMemoryRelation) and shared by both branches
    assert(plan.contains("Scan ExistingRDD"),
      s"tf must be computed once and shared by both branches:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"rank-limit pushdown missing — a stopword's postings would ship uncapped:\n$plan")
    // the checkpoint truncates the tf build out of the probe plan, so
    // the remaining hash exchanges are exactly the df rollup and the
    // window branch — one term exchange each on top of the shared
    // (term, doc) combine
    val termExchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .toSeq.distinct.size
    assert(termExchanges == 2,
      s"expected exactly 2 term exchanges outside the checkpointed tf, got $termExchanges:\n$plan")
  }
}
