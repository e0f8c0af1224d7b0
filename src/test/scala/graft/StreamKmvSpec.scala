package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamKmv

/** X139 (streaming half) — incrementally-maintained per-source KMV:
  * the streamed sketch must equal the batch sketch of everything
  * ingested so far — across a micro-batch boundary, where the state
  * store's partial buffers do the bottom-k merge — and state must stay
  * one bounded row per SOURCE (not per doc, not per distinct content).
  */
class StreamKmvSpec extends SparkSpec {

  test("streaming KMV equals the batch sketch across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(String, String)]
    val query = StreamKmv.sourceKmv(input.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName("x139_kmv")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x139_kmv").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamKmv.sourceKmv(
          docs.toSeq.toDF("source", "text")).collect()
        .map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "incremental KMV must equal the batch sketch of the full stream")

      // bounded state: one buffer row per source, regardless of doc
      // count or distinct-content count
      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }
}
