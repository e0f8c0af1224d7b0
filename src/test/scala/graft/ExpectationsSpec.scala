package graft

import graft.ops.Expectations

/** X149 — expectations audit: the clean corpus passes every contract,
  * each planted defect is counted exactly once by exactly its own
  * expectation, and the audit is partition-invariant.
  */
class ExpectationsSpec extends SparkSpec {

  import spark.implicits._

  test("X149: the corpus passes every expectation") {
    val out = Expectations.expectationsAudit(spark, sfDir).collect()
    assert(out.length == 6)
    out.foreach { r =>
      assert(r.getAs[Boolean]("pass"),
        s"expectation ${r.get(0)} failed: ${r.get(2)} violations")
      assert(r.getAs[Long]("n_violations") == 0L)
      assert(r.getAs[Double]("violation_rate") == 0.0)
    }
  }

  test("X149: each planted defect is counted by exactly its expectation") {
    val rows = Seq(
      (Some(1L), "en", 10L, "fine text", "src1"),      // clean
      (None, "en", 10L, "fine text", "src2"),          // null id
      (Some(3L), "en", 10L, "fine text", "src3"),
      (Some(3L), "en", 10L, "fine text", "src3"),      // dup id
      (Some(4L), "xx", 10L, "fine text", "src4"),      // bad lang
      (Some(5L), "en", 0L, "fine text", "src5"),       // zero chars
      (Some(6L), "en", 10L, "   ", "src6"),            // blank text
      (Some(7L), "en", 10L, "fine text", "weird-src")) // bad source
      .toDF("doc_id", "lang", "n_chars", "text", "source")
    val out = Expectations.auditOf(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(out == Map(
      "doc_id_not_null" -> 1L,
      // null ids collapse into countDistinct's null handling: 8 rows,
      // distinct non-null ids = 6 -> 2 "duplicates" (the dup pair plus
      // the null row not counted as a distinct id)
      "doc_id_unique" -> 2L,
      "lang_in_domain" -> 1L,
      "n_chars_positive" -> 1L,
      "text_nonempty" -> 1L,
      "source_format" -> 1L))
    val n = out.values
    assert(n.nonEmpty)
  }

  test("X149: NULL lang/source count as violations, not passes") {
    // NOT IN / rlike over NULL is NULL — without the explicit isNull
    // arm the audit would greenlight null categorical/key columns
    // (round-12 advice)
    val rows = Seq(
      (Some(1L), Some("en"), 10L, "fine text", Some("src1")), // clean
      (Some(2L), None: Option[String], 10L, "fine text", Some("src2")),
      (Some(3L), Some("en"), 10L, "fine text", None: Option[String]))
      .toDF("doc_id", "lang", "n_chars", "text", "source")
    val out = Expectations.auditOf(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_violations")).toMap
    assert(out("lang_in_domain") == 1L,
      "a NULL lang must be a domain violation")
    assert(out("source_format") == 1L,
      "a NULL source must be a format violation")
    assert(out("doc_id_not_null") == 0L)
  }

  test("X149: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val one = Expectations.auditOf(docs).collect().map(_.toString).toSeq
    val many = Expectations.auditOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
