package graft

import graft.ops.FdAudit

/** X165 — FD audit: a holding dependency reports zero with holds=true,
  * a planted violation counts exactly the minority row mass (the
  * minimal repair), the corpus key dependencies hold while the
  * mixed-feed ones are violated, and the audit is partition-invariant.
  */
class FdAuditSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, s, l) => (id, s"text $id", l, s, 10L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("X165: planted violations count the minority row mass exactly") {
    // src1 maps to en×3, de×1 (violating, repair = 1 row);
    // src2 maps to es×2 (holds)
    val d = docs(Seq(
      (1L, "src1", "en"), (2L, "src1", "en"), (3L, "src1", "en"),
      (4L, "src1", "de"), (5L, "src2", "es"), (6L, "src2", "es")))
    val out = FdAudit.auditOf(d).collect()
      .map(r => r.getString(0) -> r).toMap
    val sl = out("source->lang")
    assert(sl.getAs[Long]("n_groups") == 2L)
    assert(sl.getAs[Long]("n_violating_groups") == 1L)
    assert(sl.getAs[Long]("n_violating_rows") == 1L,
      "minimal repair touches exactly the minority row")
    assert(!sl.getAs[Boolean]("holds"))
    // the key dependency holds on unique ids
    val ds = out("doc_id->source")
    assert(ds.getAs[Long]("n_violating_groups") == 0L)
    assert(ds.getAs[Boolean]("holds"))
    assert(ds.getAs[Double]("violation_rate") == 0.0)
  }

  test("X165: corpus — key FDs hold, mixed-feed FDs are violated") {
    val out = FdAudit.fdAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.size == FdAudit.Deps.size)
    assert(out("doc_id->source").getAs[Boolean]("holds"),
      "a key must determine provenance")
    assert(out("doc_id->lang").getAs[Boolean]("holds"))
    assert(!out("source->lang").getAs[Boolean]("holds"),
      "the corpus feeds are multilingual by construction")
    assert(!out("lang->source").getAs[Boolean]("holds"))
  }

  test("X165: partition-count invariance") {
    val d = Tables.documents(spark, sfDir)
    val one = FdAudit.auditOf(d).collect().map(_.toString).toSeq
    val many = FdAudit.auditOf(d.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
