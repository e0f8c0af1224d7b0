package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.stream.StreamTopK

/** X119 — streaming space-saving: the algebraic invariants on a
  * crafted eviction-heavy sequence, and stream ≡ one-shot fold of the
  * same arrival order across a micro-batch boundary on the real
  * corpus, with O(shards) state.
  */
class StreamTopKSpec extends SparkSpec {

  test("space-saving invariants on an eviction-heavy sequence") {
    // 40 distinct keys into k = 4 counters, heavily skewed to 7 and 9
    val items = (0 until 200).map { i =>
      if (i % 3 == 0) 7L else if (i % 3 == 1) 9L else (i % 40).toLong
    }
    val s = StreamTopK.fold(Map.empty, items, k = 4)
    assert(s.size == 4)
    // mass conservation: every item incremented exactly one counter
    assert(s.values.map(_._1).sum == items.length.toLong)
    val truth = items.groupBy(identity).view.mapValues(_.length.toLong)
    // sandwich bound for every tracked key
    s.foreach { case (key, (cnt, err)) =>
      val t = truth.getOrElse(key, 0L)
      assert(cnt >= t, s"$key upper")
      assert(cnt - err <= t, s"$key lower")
    }
    // guaranteed heavy hitters: true > n/k must be tracked
    val n = items.length.toLong
    truth.toMap.foreach { case (key, t) =>
      if (t > n / 4) assert(s.contains(key), s"guaranteed hitter $key")
    }
    // the evicting branch actually ran (40 keys, 4 slots)
    assert(s.values.exists(_._2 > 0L))
  }

  test("fold is sequence-deterministic and batch-composable") {
    val items = (0 until 300).map(i => (i * 2654435761L % 23).abs)
    val (a, b) = items.splitAt(137)
    val oneShot = StreamTopK.fold(Map.empty, items, k = 6)
    val composed = StreamTopK.fold(StreamTopK.fold(Map.empty, a, k = 6),
      b, k = 6)
    assert(oneShot == composed)
  }

  test("streaming summaries equal the batch fold; state is O(shards)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val rows = Tables.events(spark, sfDir)
      .selectExpr("user_id", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .sortBy(r => (r._2.getTime, r._3)) // the declared arrival order
    val (first, second) = rows.splitAt(rows.length / 2)

    val input = MemoryStream[(Long, java.sql.Timestamp, Long)]
    val query = StreamTopK.userTopK(
        input.toDF().toDF("user_id", "ts", "event_id"))
      .writeStream.format("memory").queryName("x119_topk")
      .outputMode("update").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      input.addData(second.toSeq)
      query.processAllAvailable()

      val all = spark.table("x119_topk").as[StreamTopK.TopKOut].collect()
      // consumers keep the max generation per shard
      val finalGen = all.groupBy(_.shard).view.mapValues { g =>
        val gen = g.map(_.gen).max
        g.filter(_.gen == gen).map(o => o.user_id -> ((o.cnt, o.err))).toMap
      }.toMap

      val expected = rows.map(_._1).groupBy(StreamTopK.shardOf)
        .view.mapValues(ks => StreamTopK.fold(Map.empty, ks.toSeq)).toMap
      assert(finalGen.keySet == expected.keySet)
      finalGen.foreach { case (shard, got) =>
        assert(got == expected(shard), s"shard $shard")
        // mass conservation per shard
        assert(got.values.map(_._1).sum ==
          rows.count(r => StreamTopK.shardOf(r._1) == shard).toLong)
      }

      // O(shards) state: one state row per ACTIVE shard, never per key
      val stateRows = query.lastProgress.stateOperators.toSeq
        .map(_.numRowsTotal).sum
      assert(stateRows == expected.size.toLong,
        s"expected ${expected.size} state rows, got $stateRows")
    } finally query.stop()
  }
}
