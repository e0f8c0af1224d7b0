package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{ContaminationMatrix, Decontam}
import graft.stream.StreamDecontam

/** X174/X175 — streaming decontamination: the stateless per-doc guard
  * reproduces X24's flags bit-equal across a micro-batch boundary with
  * ZERO state rows, and the SUM-state rate monitor reproduces X172's
  * matrix cells on the linear columns.
  */
class StreamDecontamSpec extends SparkSpec {

  import spark.implicits._

  private def docTuples = Tables.documents(spark, sfDir)
    .select($"doc_id", $"source", $"text").collect()
    .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("X174: streamed guard flags equal the batch X24 flags bit-equal " +
    "across a micro-batch boundary; zero state rows") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = docTuples
    val (first, second) = docs.splitAt(docs.length / 2)
    // single pinned set at residue 0 — with one set the ANY-slice
    // is_eval coincides exactly with X24's per-doc convention
    val evalSets = StreamDecontam.evalGramSets(
      Tables.documents(spark, sfDir), Seq("eval_a" -> 0L)).cache()
    evalSets.count()

    val input = MemoryStream[(Long, String, String)]
    val query = StreamDecontam.decontamGuard(
        input.toDF().toDF("doc_id", "source", "text"), evalSets)
      .writeStream.format("memory").queryName("x174_guard")
      .outputMode("append").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x174_guard")
        .select($"doc_id", $"is_eval", $"n_shared", $"contaminated")
        .collect().map(_.toString).sorted.toSeq
      val batch = Decontam.decontamination(spark, sfDir)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "the stateless guard must reproduce X24's per-doc flags exactly")
      assert(streamed.nonEmpty)
      assert(streamed.exists(_.contains("true")),
        "the planted near-dups must flag at this SF (X24's evidence)")

      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == 0L,
        s"the guard is stateless by construction, got $stateRows state rows")
    } finally query.stop()
  }

  test("X175: streamed rate monitor equals the batch X172 cells on the " +
    "linear columns; state is one row per (source, eval_set)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = docTuples
    val (first, second) = docs.splitAt(docs.length / 2)
    val evalSets = StreamDecontam.evalGramSets(
      Tables.documents(spark, sfDir)).cache()
    evalSets.count()

    val input = MemoryStream[(Long, String, String)]
    val query = StreamDecontam.contaminationMonitor(
        input.toDF().toDF("doc_id", "source", "text"), evalSets)
      .writeStream.format("memory").queryName("x175_rates")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x175_rates")
        .select($"source", $"eval_set", $"n_train_docs",
          $"n_contaminated", $"doc_rate")
        .collect().map(_.toString).sorted.toSeq
      val batch = ContaminationMatrix.contaminationMatrix(spark, sfDir)
        .select($"source", $"eval_set", $"n_train_docs",
          $"n_contaminated", $"doc_rate")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "SUM state is linear — streamed cells must equal X172's matrix " +
          "on the shared columns whatever the micro-batch slicing")

      val nCells = streamed.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nCells,
        s"expected $nCells state rows (sources x sets), got $stateRows")
    } finally query.stop()
  }

  test("X177: streamed per-cell KMV equals the batch X176 sketch " +
    "bit-equal across a micro-batch boundary; state is one bounded row " +
    "per leaky cell") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = docTuples
    val (first, second) = docs.splitAt(docs.length / 2)
    val evalSets = StreamDecontam.evalGramSets(
      Tables.documents(spark, sfDir)).cache()
    evalSets.count()

    val input = MemoryStream[(Long, String, String)]
    val query = StreamDecontam.sharedGramKmv(
        input.toDF().toDF("doc_id", "source", "text"), evalSets)
      .writeStream.format("memory").queryName("x177_kmv")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x177_kmv")
        .select($"source", $"eval_set", $"k_used", $"kth_hash", $"est_q")
        .collect().map(_.toString).sorted.toSeq
      val batch = graft.ops.ContaminationKmv
        .contaminationKmv(spark, sfDir)
        .filter($"k_used" > 0L)
        .select($"source", $"eval_set", $"k_used", $"kth_hash", $"est_q")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "the bottom-k union law makes the streamed sketch independent " +
          "of micro-batch slicing — it must equal the batch X176 cells " +
          "bit-for-bit")
      assert(streamed.nonEmpty,
        "the planted near-dups leak at this SF (X172's evidence) — the " +
          "monitor must have cells to sketch")
      // X176's completed ZERO cells are exactly the ones the stream
      // holds no state for — absence is the clean bill
      val zeroCells = graft.ops.ContaminationKmv
        .contaminationKmv(spark, sfDir).filter($"k_used" === 0L).count()
      val allCells = graft.ops.ContaminationKmv
        .contaminationKmv(spark, sfDir).count()
      assert(streamed.length.toLong == allCells - zeroCells)

      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == streamed.length.toLong,
        s"expected one bounded buffer per leaky cell " +
          s"(${streamed.length}), got $stateRows state rows")
    } finally query.stop()
  }

  test("X174: a planted verbatim leak flags with the exact shared-gram " +
    "count; the benchmark doc itself never flags") {
    // doc 20 sits in eval_a (residue 0); doc 21 copies 8 of its words
    // verbatim -> 8 - 6 + 1 = 3 shared 6-grams; doc 22 is clean
    val text20 = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (20L, "s1", text20),
      (21L, "s1", text20 + " different tail here"),
      (22L, "s2", "one two three four five six seven eight"))
      .toDF("doc_id", "source", "text")
    val sets = StreamDecontam.evalGramSets(docs, Seq("eval_a" -> 0L))
    val out = StreamDecontam.decontamGuard(docs, sets).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(20L).getAs[Boolean]("is_eval"))
    assert(out(20L).getAs[Long]("n_shared") == 0L)
    assert(!out(20L).getAs[Boolean]("contaminated"),
      "the benchmark doc is the set, not a leak")
    assert(out(21L).getAs[Long]("n_shared") == 3L,
      "8 copied words at n = 6 share exactly 3 grams")
    assert(out(21L).getAs[Boolean]("contaminated"))
    assert(out(22L).getAs[Long]("n_shared") == 0L)
    assert(!out(22L).getAs[Boolean]("contaminated"))
  }
}
