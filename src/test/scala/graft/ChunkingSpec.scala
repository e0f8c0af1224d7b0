package graft

import graft.ops.Chunking

/** X33 — overlapping token-window chunking: coverage/overlap invariants
  * plus the map-only plan property (no exchange before the final sort).
  */
class ChunkingSpec extends SparkSpec {

  test("X33: chunks tile every document with the declared overlap") {
    val rows = Chunking.docChunks(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (doc, chunks) =>
      val sorted = chunks.sortBy(_.getAs[Long]("chunk_idx"))
      // indices are dense from 0; starts step by Stride
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[Long]("chunk_idx") == i.toLong)
        assert(r.getAs[Long]("start_tok") == i.toLong * Chunking.Stride)
      }
      // every chunk but the last is full-size; the last is non-empty and
      // reaches the end of the doc (start + n_tok = total tokens)
      val last = sorted.last
      sorted.init.foreach(r =>
        assert(r.getAs[Long]("n_tok") == Chunking.ChunkSize.toLong, s"doc $doc"))
      assert(last.getAs[Long]("n_tok") >= 1L)
      val total = last.getAs[Long]("start_tok") + last.getAs[Long]("n_tok")
      // chunk text round-trips: stitching the strided prefixes of each
      // chunk back together must reproduce every token exactly once
      val words = sorted.flatMap { r =>
        val toks = r.getAs[String]("chunk_text").split(" ", -1)
        if (r eq last) toks else toks.take(Chunking.Stride)
      }
      assert(words.length.toLong == total, s"doc $doc lost tokens")
      // and each overlap region agrees between neighbors
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val at = a.getAs[String]("chunk_text").split(" ", -1)
          val bt = b.getAs[String]("chunk_text").split(" ", -1)
          assert(at.drop(Chunking.Stride).sameElements(
            bt.take(Chunking.ChunkSize - Chunking.Stride)),
            s"doc $doc overlap mismatch at chunk ${b.getAs[Long]("chunk_idx")}")
        case _ => ()
      }
    }
  }

  test("X33: short docs produce exactly one short chunk") {
    import spark.implicits._
    val tiny = Seq((7L, "just three words"), (8L, "")).toDF("doc_id", "text")
    val rows = Chunking.chunksOf(tiny, 64, 48).collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("chunk_idx") == 0L)
      assert(r.getAs[Long]("n_tok") >= 1L) // "" tokenizes to one empty token
    }
  }

  test("X33: map-only plan — no exchange before the final ORDER BY") {
    val plan = Chunking.docChunks(spark, sfDir)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1,
      s"chunking must be map-only (1 final range exchange), got $exchanges:\n$plan")
    assert(!plan.contains("lambdafunction"),
      s"chunk arithmetic must be lambda-free built-ins:\n$plan")
  }
}
