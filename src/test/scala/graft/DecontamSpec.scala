package graft

import graft.ops.Decontam

/** X24 — benchmark decontamination: planted-overlap behavior pinned on
  * synthetic docs (engine parity on the real corpus is the oracle's job).
  */
class DecontamSpec extends SparkSpec {

  test("X24: a verbatim 6-gram from an eval doc contaminates, shorter overlap does not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val run = "alpha bravo charlie delta echo foxtrot" // 6 words
    val docs = Seq(
      // eval doc (id % 20 == 0) containing the run
      20L -> s"golf hotel $run india juliet",
      // training doc sharing the full 6-gram → contaminated
      3L -> s"kilo lima $run mike",
      // training doc sharing only 5 of the 6 words in a row → clean
      7L -> "kilo lima alpha bravo charlie delta echo november oscar",
      // unrelated training doc → clean
      9L -> "papa quebec romeo sierra tango uniform victor whiskey xray"
    ).toDF("doc_id", "text")
    // re-point the table seam through a temp view-free path: use the op's
    // core by writing docs to a temp dir as documents.parquet
    val dir = java.nio.file.Files.createTempDirectory("decontam-").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Decontam.decontamination(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Boolean]("is_eval"), r.getAs[Long]("n_shared"),
          r.getAs[Boolean]("contaminated"))).toMap
    assert(out(20L) == ((true, 0L, false)), "eval docs are never flagged")
    assert(out(3L)._3 && out(3L)._2 >= 1L, "verbatim 6-gram must contaminate")
    assert(out(7L) == ((false, 0L, false)), "5-word overlap is below the rule")
    assert(out(9L) == ((false, 0L, false)))
  }

  test("X24: flags fire on the real corpus and only off the eval set") {
    val rows = Decontam.decontamination(spark, sfDir).collect()
    assert(rows.length == Tables.documents(spark, sfDir).count())
    assert(!rows.exists(r =>
      r.getAs[Boolean]("is_eval") && r.getAs[Boolean]("contaminated")))
    assert(rows.exists(r => r.getAs[Boolean]("contaminated")),
      "the sf corpus plants near-dups of eval docs — some must be flagged")
    // n_shared is 0 exactly when not contaminated (for non-eval docs)
    rows.filter(r => !r.getAs[Boolean]("is_eval")).foreach { r =>
      assert((r.getAs[Long]("n_shared") > 0) == r.getAs[Boolean]("contaminated"))
    }
  }
}
