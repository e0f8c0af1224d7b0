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
    assert(plan.contains("InMemoryTableScan"),
      s"tf must be computed once and shared by both branches:\n$plan")
    assert(plan.linesIterator.exists(l =>
        l.contains("WindowGroupLimit") && l.contains("Partial")),
      s"rank-limit pushdown missing — a stopword's postings would ship uncapped:\n$plan")
    // count exchanges OUTSIDE the cached tf subtree (the cached plan is
    // printed under every InMemoryRelation occurrence — skip those
    // indented blocks): the df rollup and the window branch each add
    // exactly one term exchange on top of the shared (term,doc) combine
    val lines = plan.linesIterator.toVector
    def indent(s: String) = s.takeWhile(!_.isLetter).length
    val outside = new scala.collection.mutable.ArrayBuffer[String]
    var skipDeeper = -1
    lines.foreach { l =>
      if (skipDeeper >= 0 && indent(l) > skipDeeper) () // inside cached tree
      else {
        skipDeeper = -1
        if (l.contains("InMemoryRelation")) skipDeeper = indent(l)
        else outside += l
      }
    }
    val termExchanges = outside
      .filter(_.contains("Exchange hashpartitioning"))
      .flatMap("plan_id=(\\d+)".r.findFirstMatchIn(_).map(_.group(1)))
      .distinct.size
    assert(termExchanges == 2,
      s"expected exactly 2 term exchanges outside the cached tf, got $termExchanges:\n$plan")
  }
}
