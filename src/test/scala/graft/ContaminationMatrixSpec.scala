package graft

import graft.ops.{ContaminationMatrix, Decontam}

/** X172 — contamination matrix: a planted verbatim leak lands in
  * exactly its (source, eval-set) cell, clean cells exist with exact
  * zeros, the eval_a column reconciles with X24's doc-level flags on
  * the real corpus, and the matrix is partition-invariant.
  */
class ContaminationMatrixSpec extends SparkSpec {

  import spark.implicits._

  private def cells(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getAs[String]("source"), r.getAs[String]("eval_set")) -> r).toMap

  test("X172: a planted leak lands in exactly its cell") {
    // doc 20 is eval_a (20 % 20 = 0), doc 7 is eval_b; doc 21 (srcX,
    // training) copies eval_a's text verbatim; doc 22 (srcY) is clean
    val evalText = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (20L, evalText, "srcX"),
      (7L, "one two three four five six seven eight", "srcY"),
      (21L, evalText, "srcX"),
      (22L, "nine ten eleven twelve thirteen fourteen fifteen", "srcY"))
      .toDF("doc_id", "text", "source")
    val out = cells(ContaminationMatrix.matrixOf(docs))
    assert(out.size == 4, "2 sources × 2 eval sets, zero cells included")
    val leak = out(("srcX", "eval_a"))
    assert(leak.getAs[Long]("n_contaminated") == 1L)
    assert(leak.getAs[Long]("n_shared_grams") == 3L,
      "an 8-word verbatim copy shares exactly 8−6+1 distinct 6-grams")
    assert(leak.getAs[Double]("doc_rate") == 1.0)
    assert(out(("srcX", "eval_b")).getAs[Long]("n_contaminated") == 0L,
      "the leak must not bleed into the other suite's cell")
    assert(out(("srcY", "eval_a")).getAs[Long]("n_contaminated") == 0L)
    assert(out(("srcY", "eval_b")).getAs[Long]("n_contaminated") == 0L,
      "a doc IN an eval set is not training contamination")
    assert(out(("srcY", "eval_a")).getAs[Long]("n_train_docs") == 1L,
      "eval docs leave the training denominator")
  }

  test("X172: eval_a reconciles with X24's doc-level flags") {
    // X24's eval set IS x172's eval_a, but X24's training side keeps
    // eval_b docs while x172 excludes them — so x172's eval_a column
    // equals X24's contaminated docs MINUS those sitting in eval_b
    val x24 = Decontam.decontamination(spark, sfDir)
      .filter($"contaminated" && $"doc_id" % 20 =!= 7)
      .count()
    val matrix = ContaminationMatrix.contaminationMatrix(spark, sfDir)
      .filter($"eval_set" === "eval_a")
    val total = matrix.collect().map(_.getAs[Long]("n_contaminated")).sum
    assert(total == x24,
      s"matrix eval_a total $total must equal X24's reconciled count $x24")
    matrix.collect().foreach { r =>
      if (r.getAs[Long]("n_train_docs") == 0L)
        assert(r.isNullAt(r.fieldIndex("doc_rate")),
          "zero training mass must report NULL rate, not a clean 0")
      else {
        val rate = r.getAs[Double]("doc_rate")
        assert(rate >= 0.0 && rate <= 1.0)
      }
    }
  }

  test("X172: the registered query is a full |sources|x|sets| matrix") {
    val out = ContaminationMatrix.contaminationMatrix(spark, sfDir)
      .collect()
    val nSources = Tables.documents(spark, sfDir)
      .select("source").distinct().count()
    assert(out.length == nSources * ContaminationMatrix.EvalSets.length)
  }

  test("X172: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val one = ContaminationMatrix.matrixOf(docs)
      .collect().map(_.toString).toSeq
    val many = ContaminationMatrix.matrixOf(docs.repartition(13))
      .collect().map(_.toString).toSeq
    assert(one == many)
  }
}
