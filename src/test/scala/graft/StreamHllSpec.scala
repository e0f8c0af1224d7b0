package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Hll
import graft.stream.StreamHll

/** X143 — incrementally-maintained per-source HLL: the streamed sketch
  * must equal the batch sketch of everything ingested so far (across a
  * micro-batch boundary, where the state store's element-wise max does
  * the register merge), the aggregator must agree with X140's
  * relational register build on the same data, and state must stay one
  * bounded row per SOURCE.
  */
class StreamHllSpec extends SparkSpec {

  test("streaming HLL equals the batch sketch and X140's registers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(String, String)]
    val query = StreamHll.sourceHll(input.toDF().toDF("source", "text"))
      .writeStream.format("memory").queryName("x143_hll")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x143_hll").collect()
        .map(_.toString).sorted.toSeq
      val batch = StreamHll.sourceHll(
          docs.toSeq.toDF("source", "text")).collect()
        .map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "incremental HLL must equal the batch sketch of the full stream")

      // law-compatibility with X140's relational build: same n_regs/
      // v_zero/s_sum/est per source (X140 additionally carries the
      // exact audit; drop it and align column order)
      val relational = Hll.hllOf(
          docs.toSeq.toDF("source", "text")
            .select($"source".as("grp"), $"text".as("v")))
        .select($"grp", $"n_regs", $"v_zero", $"s_sum", $"est_raw", $"est")
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == relational,
        "aggregator registers must match X140's relational registers")

      // bounded state: one 64-slot buffer row per source
      val nSources = docs.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nSources,
        s"expected $nSources state rows, got $stateRows")
    } finally query.stop()
  }
}
