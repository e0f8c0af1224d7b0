package graft

import graft.ops.Boilerplate

/** X157 — boilerplate phrases: a planted shared header surfaces with
  * exact df/coverage, in-document repetition counts once (document
  * frequency), the MinDf floor drops one-off phrases, ranks tie-break
  * on the phrase, and the report is partition-invariant.
  */
class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  test("X157: a planted header surfaces with exact coverage") {
    val header = "subscribe to our newsletter"
    val docs = (1L to 8L).map { i =>
      // bodies share NOTHING: every word is suffixed with the doc id
      val body = (1 to 6).map(j => s"u${i}w$j").mkString(" ")
      // 6 of 8 docs carry the header
      val text = if (i <= 6) s"$header $body" else body
      ("s1", i, text)
    }.toDF("source", "doc_id", "text")
    val out = Boilerplate.phrasesOf(docs).collect()
    assert(out.nonEmpty)
    val top = out.head
    assert(top.getAs[String]("phrase") == "subscribe to our",
      s"top phrase was ${top.get(2)}")
    assert(top.getAs[Long]("df") == 6L)
    assert(top.getAs[Long]("n_docs") == 8L)
    assert(top.getAs[Double]("coverage") == 0.75)
    // every reported phrase clears the floor
    out.foreach(r => assert(r.getAs[Long]("df") >= Boilerplate.MinDf))
  }

  test("X157: in-document repetition counts once (df, not tf)") {
    val docs = Seq(
      ("s", 1L, "lorem ipsum dolor lorem ipsum dolor lorem ipsum dolor"),
      ("s", 2L, "lorem ipsum dolor and unrelated tail words here"),
      ("s", 3L, "totally different content with no overlap at all"))
      .toDF("source", "doc_id", "text")
    val out = Boilerplate.phrasesOf(docs).collect()
      .map(r => r.getAs[String]("phrase") -> r.getAs[Long]("df")).toMap
    assert(out("lorem ipsum dolor") == 2L,
      "three in-doc repeats in doc 1 must still count doc 1 once")
  }

  test("X157: ranks are dense, ordered by (df desc, phrase asc)") {
    val out = Boilerplate.boilerplatePhrases(spark, sfDir).collect()
    assert(out.nonEmpty, "the corpus has near-dup docs; phrases must show")
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val rs = rows.map(_.getAs[Long]("rank")).toSeq
      assert(rs == (1L to rs.length).toSeq)
      val keys = rows.sortBy(_.getAs[Long]("rank"))
        .map(r => (-r.getAs[Long]("df"), r.getAs[String]("phrase"))).toSeq
      assert(keys == keys.sorted)
      assert(rs.length <= Boilerplate.K)
    }
  }

  test("X157: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val one = Boilerplate.phrasesOf(docs).collect().map(_.toString).toSeq
    val many = Boilerplate.phrasesOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
