package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.QuantileSketch
import graft.stream.StreamQuantile

/** X144 (streaming half) — incrementally-maintained per-source quantile
  * sketches: the streamed estimates must equal the batch estimates of
  * everything ingested so far (across a micro-batch boundary, where the
  * state store's partial buffers do the bottom-k merge), must agree
  * with X135's window-form estimate columns on the same data, and state
  * must stay one bounded row per SOURCE.
  */
class StreamQuantileSpec extends SparkSpec {

  test("streaming quantile sketch equals batch and X135 across batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(String, Long, Long)]
    val query = StreamQuantile.sourceQuantiles(
        input.toDF().toDF("source", "doc_id", "n_chars"))
      .writeStream.format("memory").queryName("x144_quantiles")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x144_quantiles").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamQuantile.sourceQuantiles(
          docs.toSeq.toDF("source", "doc_id", "n_chars")).collect()
        .map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "incremental sketch must equal the batch sketch of the full stream")

      // law-compatibility with X135's window form: same k_used and
      // estimate columns per source
      val win = QuantileSketch.quantileSketch(spark, sfDir)
        .select($"grp", $"k_used", $"est_p25", $"est_p50", $"est_p90")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == win,
        "streamed estimates must match X135's window-form estimates")

      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }
}
