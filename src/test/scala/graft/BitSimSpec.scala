package graft

import graft.ops.BitSim

/** X92 — sign packing and Hamming top-k: hand-computed word values,
  * identical-vector zero distance, and a full brute-force replay of the
  * pipeline on the real embeddings.
  */
class BitSimSpec extends SparkSpec {

  import spark.implicits._

  private def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)

  test("X92 packing: bit i set iff dim i ≥ 0, split across lo/hi words") {
    val e = Seq(
      (0L, vec(i => if (i == 0) 1f else -1f)), // only dim 1 → lo bit 0
      (1L, vec(i => if (i == 32) 1f else -1f)), // only dim 33 → hi bit 0
      (2L, vec(i => if (i < 32) 1f else -1f)), // full lo word
      (3L, vec(_ => -1f))) // nothing set
      .toDF("vec_id", "embedding")
    val got = BitSim.packedOf(e).as[(Long, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(0L) == ((1L, 0L)))
    assert(got(1L) == ((0L, 1L)))
    assert(got(2L) == (((1L << 32) - 1, 0L)))
    assert(got(3L) == ((0L, 0L)))
  }

  test("X92: an identical vector is the rank-1 neighbor at Hamming 0") {
    val base = vec(i => if (i % 3 == 0) 1f else -1f)
    val rows = (0L until 8L).map { id =>
      val v = if (id == 6L) base.clone()
      else if (id == 0L) base.clone()
      else vec(i => if ((i + id) % 2 == 0) 1f else -1f)
      (id, v)
    }
    val got = BitSim.hammingTopKOf(rows.toDF("vec_id", "embedding"))
      .select($"q_id", $"rk", $"vec_id", $"hamming")
      .as[(Long, Long, Long, Long)].collect()
    val q0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(q0.head == ((0L, 1L, 6L, 0L))) // the clone, not itself
    assert(q0.forall(r => r._3 != 0L))
  }

  test("X92: equals a driver-side brute-force replay on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def pack(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      var i = 0
      while (i < 64) {
        if (v(i) >= 0f) {
          if (i < 32) lo |= 1L << i else hi |= 1L << (i - 32)
        }
        i += 1
      }
      (lo, hi)
    }
    val packed = e.map { case (id, v) => id -> pack(v) }.toMap
    val expected = (for {
      q <- 0L until BitSim.NQueries.toLong
      (qlo, qhi) = packed(q)
      ranked = packed.toSeq.filter(_._1 != q)
        .map { case (id, (lo, hi)) =>
          (java.lang.Long.bitCount(lo ^ qlo) +
            java.lang.Long.bitCount(hi ^ qhi)).toLong -> id
        }
        .sortBy(identity).take(BitSim.K)
      ((h, id), idx) <- ranked.zipWithIndex
    } yield (q, idx + 1L, id, h)).toSeq
    val got = BitSim.hammingTopK(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("X92 plan: broadcast query side, partial top-k aggregate, no window") {
    val plan = BitSim.hammingTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
    assert(plan.contains("ObjectHashAggregate"))
    assert(!plan.contains("RunningWindowFunction") && !plan.contains("Window "),
      "per-query top-k must run as the bounded aggregate, not a window")
  }
}
