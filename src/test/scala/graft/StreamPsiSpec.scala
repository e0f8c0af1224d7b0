package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamPsi

/** X167 — streaming PSI maintenance: streamed ≡ batch BIT-equal across
  * a micro-batch boundary (band counts are plain SUM state — exact, no
  * reservoir), one bounded state row per source, a stream identical to
  * its reference reads exactly zero, a planted band shift reproduces
  * the hand-computed X163-convention score, and a never-calibrated
  * source alarms instead of vanishing.
  */
class StreamPsiSpec extends SparkSpec {

  import spark.implicits._

  private def docsDF(rows: Seq[(String, Long, Long)]) =
    rows.toDF("source", "doc_id", "n_chars").drop("doc_id")

  test("streamed PSI equals batch exactly; state is one row per source") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (first, second) = docs.splitAt(docs.length / 2)
    // reference = the same corpus with every length shifted +150 (more
    // than a band width — every source must read a real score)
    val ref = StreamPsi.refBands(
      docsDF(docs.toSeq.map { case (s, i, v) => (s, i, v + 150L) })
        .toDF("source", "n_chars")).cache()

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamPsi.psiMonitor(
        input.toDF().toDF("source", "doc_id", "n_chars"), ref)
      .writeStream.format("memory").queryName("x167_psi")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x167_psi").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamPsi.psiMonitor(docsDF(docs.toSeq), ref)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "plain SUM state must make streamed ≡ batch bit-equal")
      assert(streamed.nonEmpty)
      spark.table("x167_psi").collect().foreach { r =>
        assert(r.getAs[Double]("psi") > 0.0,
          s"source ${r.get(0)}: a +150 shift must score positive PSI")
      }

      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }

  test("a stream identical to its reference reads exactly zero") {
    val docs = (1L to 200L).map(i => ("s", i, (i * 37) % 950))
    val ref = StreamPsi.refBands(docsDF(docs).toDF("source", "n_chars"))
    val r = StreamPsi.psiMonitor(docsDF(docs), ref).collect()(0)
    assert(r.getAs[Boolean]("has_ref"))
    assert(r.getAs[Double]("psi") == 0.0,
      "identical band counts ⇒ every term exactly zero")
  }

  test("a planted band shift reproduces the hand-computed score") {
    // live: 40 docs in band 0; ref: 40 docs in band 1 — two-band swap,
    // all other bands empty on both sides (Laplace +1 keeps them 0)
    val cur = (1L to 40L).map(i => ("s", i, 10L))
    val refDocs = (1L to 40L).map(i => ("s", i, 150L))
    val ref = StreamPsi.refBands(docsDF(refDocs).toDF("source", "n_chars"))
    val got = StreamPsi.psiMonitor(docsDF(cur), ref).collect()(0)
      .getAs[Double]("psi")
    val b = StreamPsi.Bands
    def term(c: Long, r: Long): Long = {
      val p = (c + 1).toDouble / (40 + b).toDouble
      val q = (r + 1).toDouble / (40 + b).toDouble
      math.floor((p - q) * math.log(p / q) * 1e9).toLong
    }
    val expected =
      (term(40L, 0L) + term(0L, 40L)).toDouble / 1e9
    assert(got == expected,
      s"planted two-band swap: got $got, expected $expected")
  }

  test("a source absent from the reference alarms instead of vanishing") {
    val ref = StreamPsi.refBands(
      docsDF((1L to 20L).map(i => ("known", i, 100L)))
        .toDF("source", "n_chars"))
    val out = StreamPsi.psiMonitor(
        docsDF(Seq(("known", 1L, 100L), ("novel", 2L, 500L))), ref)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(out.contains("novel"), "the novel source must emit a row")
    val n = out("novel")
    assert(!n.getAs[Boolean]("has_ref"))
    assert(n.getAs[Long]("n_ref") == 0L)
    assert(n.isNullAt(n.fieldIndex("psi")),
      "no reference ⇒ NULL psi, the flag is the alarm")
    assert(out("known").getAs[Boolean]("has_ref"))
  }
}
