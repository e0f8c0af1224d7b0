package graft

import graft.ops.CdcChunking

/** X58 — content-defined chunking: chunk stats must equal a driver-side
  * reimplementation, an insertion must resynchronize after the next
  * boundary (the property fixed-width tiling lacks), and the plan must
  * keep windows doc-partitioned.
  */
class CdcChunkingSpec extends SparkSpec {

  /** Driver-side reference chunker: (chunk_key, n_tokens) list per doc. */
  private def refChunks(text: String): Seq[(Long, Long)] = {
    val hs = text.toLowerCase.trim.split("\\s+").toSeq.map(Hashing40.of)
    val out = collection.mutable.ArrayBuffer[Seq[Long]]()
    var cur = collection.mutable.ArrayBuffer[Long]()
    hs.foreach { h =>
      cur += h
      if (h % CdcChunking.Divisor == 0) { out += cur.toSeq; cur = collection.mutable.ArrayBuffer() }
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq.map { chunk =>
      val key = chunk.zipWithIndex.map { case (h, i) => (i + 1) * h }.sum +
        chunk.length
      (key, chunk.length.toLong)
    }
  }

  /** Portable 40-bit md5, mirroring Hashing.md5Long40 driver-side. */
  private object Hashing40 {
    def of(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (d(8).toLong & 0xffL) | ((d(9).toLong & 0xffL) << 8) |
        ((d(10).toLong & 0xffL) << 16) | ((d(11).toLong & 0xffL) << 24) |
        ((d(12).toLong & 0xffL) << 32)
    }
  }

  test("X58: per-source stats equal the driver-side reference chunker") {
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val perDoc = rows.map { case (_, src, text) => (src, refChunks(text)) }
    val freq = perDoc.flatMap(_._2.map(_._1)).groupBy(identity)
      .map { case (k, xs) => k -> xs.length }
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      val chunks = ds.flatMap(_._2)
      src -> ((chunks.length.toLong, chunks.map(_._2).sum,
        chunks.count(c => freq(c._1) >= 2).toLong,
        chunks.map(_._1).distinct.length.toLong))
    }
    val got = CdcChunking.cdcChunking(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_chunks"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_chunks"), r.getAs[Long]("n_distinct_chunks"))))
      .toMap
    assert(got == expected)
    assert(expected.values.map(_._1).sum > 0)
  }

  test("X58: an insertion resynchronizes at the next boundary") {
    val base = Tables.documents(spark, sfDir)
      .select("text").collect()(0).getString(0)
    val baseKeys = refChunks(base).map(_._1)
    // pick an inserted token that is NOT itself a boundary token, so the
    // edit lands inside the first chunk
    val ins = Iterator.from(0).map(i => s"ins$i")
      .find(t => Hashing40.of(t) % CdcChunking.Divisor != 0).get
    val edited = s"$ins $base"
    val editedKeys = refChunks(edited).map(_._1)
    assert(baseKeys.length >= 3, "fixture doc must chunk into several pieces")
    // only the first chunk absorbs the edit; everything after the first
    // boundary keeps its key — fixed tiling would shift EVERY span
    assert(editedKeys.drop(1) == baseKeys.drop(1),
      "chunks after the first boundary must keep their keys")
    assert(editedKeys.head != baseKeys.head,
      "the edited chunk must change key")
  }

  test("X58: windows stay doc-partitioned; aggregation has partials") {
    val df = CdcChunking.cdcChunking(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"),
      s"chunk-id windows must stay doc-partitioned:\n$plan")
  }
}
