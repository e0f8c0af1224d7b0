package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.{Entropy, FdAudit}
import graft.stream.StreamQuality

/** X168/X169 — streaming quality maintenance: each monitor streamed ≡
  * its batch op BIT-equal across a micro-batch boundary (keyed counts
  * are linear state), state bounded by its declared key domain, and
  * the FD monitor's violation accounting agreeing with X165's batch
  * audit on the streamed (categorical) dependencies.
  */
class StreamQualitySpec extends SparkSpec {

  import spark.implicits._

  test("X168: streamed entropy equals the batch X164 exactly; state is " +
    "one row per user") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .select($"user_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (first, second) = events.splitAt(events.length / 2)

    val input = MemoryStream[(Long, String)]
    val query = StreamQuality.entropyMonitor(
        input.toDF().toDF("user_id", "event_type"))
      .writeStream.format("memory").queryName("x168_entropy")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x168_entropy").collect()
        .map(_.toString).sorted.toSeq
      val batch = Entropy.entropyOf(
          events.toSeq.toDF("user_id", "event_type"))
        .collect().map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "linear keyed counts must make streamed ≡ the batch X164 " +
          "bit-equal (same columns, same quantized terms)")
      assert(streamed.nonEmpty)

      val nUsers = events.map(_._1).distinct.length.toLong
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == nUsers,
        s"expected $nUsers state rows, got $stateRows")
    } finally query.stop()
  }

  test("X169: streamed FD audit equals the batch X165 on the streamed " +
    "dependencies; state is one row per dependency") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val (first, second) = docs.splitAt(docs.length / 2)

    val input = MemoryStream[(Long, String, String)]
    val query = StreamQuality.fdMonitor(
        input.toDF().toDF("doc_id", "source", "lang"))
      .writeStream.format("memory").queryName("x169_fd")
      .outputMode("complete").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val streamed = spark.table("x169_fd").collect()
        .map(_.toString).sorted.toSeq
      val streamedNames = StreamQuality.StreamDeps
        .map { case (a, b) => s"$a->$b" }.toSet
      val batch = FdAudit.auditOf(
          docs.toSeq.toDF("doc_id", "source", "lang"))
        .collect()
        .filter(r => streamedNames(r.getAs[String]("dependency")))
        .map(_.toString).sorted.toSeq
      assert(streamed == batch,
        "the streamed cell counts must reproduce X165's statistics " +
          "bit-equal on the categorical dependencies")
      assert(streamed.length == StreamQuality.StreamDeps.length)

      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == StreamQuality.StreamDeps.length.toLong,
        s"expected ${StreamQuality.StreamDeps.length} state rows, " +
          s"got $stateRows")
    } finally query.stop()
  }

  test("X168/X169: null keys group as the sentinel — the monitors " +
    "survive dirty corpora and still equal the batch ops") {
    // the CurationMix-style dirty fixture: a null event_type and a null
    // source/lang must neither NPE the aggregators (round-14 advice:
    // KeyedCounts.finish sortBy / FdCells.finish substring) nor change
    // the batch law — batch X164/X165 group nulls as a key, and the
    // `\u0001` sentinel group IS that group (counts only, no key names
    // in either output)
    val events = Seq((1L, "view"), (1L, null), (1L, null), (2L, "buy"))
      .toDF("user_id", "event_type")
    val ent = StreamQuality.entropyMonitor(events).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(ent(1L).getAs[Long]("n_types") == 2L,
      "the null events must count as ONE type next to view")
    assert(ent(1L).getAs[Long]("n_events") == 3L)
    val batchEnt = ops.Entropy.entropyOf(events).collect()
      .map(_.toString).sorted.toSeq
    assert(StreamQuality.entropyMonitor(events).collect()
      .map(_.toString).sorted.toSeq == batchEnt,
      "null-as-sentinel must reproduce the batch null-as-group entropy")

    val docs = Seq((1L, "s1", "en"), (2L, "s1", null), (3L, null, "en"),
      (4L, "s2", "de")).toDF("doc_id", "source", "lang")
    val fd = StreamQuality.fdMonitor(docs).collect()
      .map(r => r.getAs[String]("dependency") -> r).toMap
    // s1 maps to {en, null} — the null is a VALUE, so the dependency
    // breaks with one minority row; null-source is its own determinant
    val sl = fd("source->lang")
    assert(!sl.getAs[Boolean]("holds"))
    assert(sl.getAs[Long]("n_groups") == 3L,
      "null source must be its own group, not dropped")
    assert(sl.getAs[Long]("n_violating_rows") == 1L)
    val streamedNames = StreamQuality.StreamDeps
      .map { case (a, b) => s"$a->$b" }.toSet
    val batchFd = ops.FdAudit.auditOf(docs).collect()
      .filter(r => streamedNames(r.getAs[String]("dependency")))
      .map(_.toString).sorted.toSeq
    assert(StreamQuality.fdMonitor(docs).collect()
      .map(_.toString).sorted.toSeq == batchFd,
      "null-as-sentinel must reproduce the batch X165 statistics")
  }

  test("X169: a planted provenance merge flips holds to false with the " +
    "exact repair mass") {
    // source s1 emits lang en 7×, then a merged crawl injects 3 es rows
    // — the dependency breaks with exactly the minority mass violating
    val docs = ((1L to 7L).map(i => (i, "s1", "en")) ++
      (8L to 10L).map(i => (i, "s1", "es")) ++
      (11L to 15L).map(i => (i, "s2", "de")))
      .toDF("doc_id", "source", "lang")
    val out = StreamQuality.fdMonitor(docs).collect()
      .map(r => r.getAs[String]("dependency") -> r).toMap
    val sl = out("source->lang")
    assert(!sl.getAs[Boolean]("holds"))
    assert(sl.getAs[Long]("n_groups") == 2L)
    assert(sl.getAs[Long]("n_violating_groups") == 1L)
    assert(sl.getAs[Long]("n_violating_rows") == 3L,
      "repair mass = the rows outside the majority value")
    assert(sl.getAs[Double]("violation_rate") == 3.0 / 15.0)
    // the reverse dependency still holds (each lang has one source)
    assert(out("lang->source").getAs[Boolean]("holds"))
  }
}
