package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamCentroid

/** X162 — streaming centroid maintenance: streamed ≡ batch BIT-equal
  * across a micro-batch boundary (i64-linear state), one bounded state
  * row per label, stream-equals-reference reads zero drift / cosine 1,
  * and the VectorSumQ kernel rejects ragged vectors loudly.
  */
class StreamCentroidSpec extends SparkSpec {

  import spark.implicits._

  test("streamed centroids equal batch exactly; state is one row per label") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"label".cast("long"), $"embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val (first, second) = vecs.splitAt(vecs.length / 2)
    val ref = StreamCentroid.refCentroids(
      vecs.toSeq.toDF("label", "embedding")).cache()

    val input = MemoryStream[(Long, Array[Float])]
    val query = StreamCentroid.centroidMonitor(
        input.toDF().toDF("label", "embedding"), ref)
      .writeStream.format("memory").queryName("x162_centroids")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x162_centroids").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamCentroid.centroidMonitor(
          vecs.toSeq.toDF("label", "embedding"), ref)
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "i64-linear state must make streamed ≡ batch bit-equal")
      assert(streamed.nonEmpty)

      // the full stream IS the reference corpus, so the live centroid
      // equals the reference centroid: zero drift, cosine 1 (up to the
      // cosQ division ulp)
      spark.table("x162_centroids").collect().foreach { r =>
        assert(r.getAs[Double]("l2sq_drift") == 0.0,
          s"label ${r.get(0)} drifted from itself")
        assert(math.abs(r.getAs[Double]("cos_ref") - 1.0) < 1e-12)
      }

      val nLabels = vecs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nLabels,
        s"expected $nLabels state rows, got $stateRows")
    } finally query.stop()
  }

  test("a drifted stream reports the planted distance vs reference") {
    val ref = StreamCentroid.refCentroids(
      Seq((1L, Array(1.0f, 0.0f))).toDF("label", "embedding"))
    val out = StreamCentroid.centroidMonitor(
        Seq((1L, Array(0.0f, 1.0f))).toDF("label", "embedding"), ref)
      .collect()(0)
    assert(math.abs(out.getAs[Double]("l2sq_drift") - 2.0) < 1e-9)
    assert(math.abs(out.getAs[Double]("cos_ref")) < 1e-12)
  }

  test("a label absent from the reference alarms instead of vanishing") {
    // round-13 advice item: the inner join dropped never-calibrated
    // labels. The left join must emit the live row flagged, NULL drift.
    val ref = StreamCentroid.refCentroids(
      Seq((1L, Array(1.0f, 0.0f))).toDF("label", "embedding"))
    val out = StreamCentroid.centroidMonitor(
        Seq((1L, Array(1.0f, 0.0f)), (7L, Array(0.5f, 0.5f)),
          (7L, Array(0.5f, 0.5f))).toDF("label", "embedding"), ref)
      .collect().map(r => r.getAs[Long]("label") -> r).toMap
    assert(out.contains(7L), "the novel label must emit a row")
    val n = out(7L)
    assert(!n.getAs[Boolean]("has_ref"))
    assert(n.getAs[Long]("n_vecs") == 2L,
      "the live state must still be maintained for a novel label")
    assert(n.isNullAt(n.fieldIndex("l2sq_drift")) &&
      n.isNullAt(n.fieldIndex("cos_ref")),
      "no reference centroid ⇒ NULL drift, the flag is the alarm")
    assert(out(1L).getAs[Boolean]("has_ref") &&
      out(1L).getAs[Double]("l2sq_drift") == 0.0)
  }

  test("VectorSumQ rejects ragged vectors loudly") {
    val e = Seq((1L, Array(1.0f, 2.0f)), (1L, Array(1.0f)))
      .toDF("label", "embedding")
    val ref = StreamCentroid.refCentroids(
      Seq((1L, Array(1.0f, 0.0f))).toDF("label", "embedding"))
    val ex = intercept[Exception] {
      StreamCentroid.centroidMonitor(e, ref).collect()
    }
    assert(ex.getMessage != null)
  }
}
