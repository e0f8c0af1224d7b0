package graft

import graft.ops.{Dedup, Hybrid}

/** X69 — hybrid RRF: the fused ranking must equal a driver-side
  * recompute of both retrievers (JVM dotQ replica for dense, shingle
  * sets for lexical) and the standard RRF formula at k = 60.
  */
class HybridSpec extends SparkSpec {

  private def dotQ(a: Array[Float], b: Array[Float]): Long =
    a.zip(b).map { case (x, y) =>
      math.floor(x.toDouble * y.toDouble * 1e15).toLong }.sum

  test("X69: fused top-10 equals driver-side two-retriever recompute") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val sets = Dedup.shinglesOf(Tables.documents(spark, sfDir)).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val expected = (0L until 3L).flatMap { q =>
      val qe = vecs(q)
      val dense = vecs.toSeq.filter(_._1 != q)
        .map { case (id, e) =>
          (id, dotQ(e, qe).toDouble /
            (math.sqrt(dotQ(e, e).toDouble) *
              math.sqrt(dotQ(qe, qe).toDouble)))
        }
        .sortBy { case (id, c) => (-c, id) }.take(20)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      val qset = sets.getOrElse(q, Set.empty)
      val lex = sets.toSeq.filter(_._1 != q)
        .map { case (id, s) => (id, (s & qset).size) }
        .filter(_._2 > 0)
        .sortBy { case (id, n) => (-n, id) }.take(20)
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1) }.toMap
      (dense.keySet ++ lex.keySet).toSeq
        .map { id =>
          val s = dense.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
            lex.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
          (id, s)
        }
        .sortBy { case (id, s) => (-s, id) }.take(10)
        .zipWithIndex.map { case ((id, s), i) => (q, i + 1L, id, s) }
    }.toSet

    val got = Hybrid.hybridRrf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2),
        r.getDouble(5))).toSet
    assert(got.map(x => (x._1, x._2, x._3)) ==
      expected.map(x => (x._1, x._2, x._3)), "query/rank/doc triples")
    got.foreach { case (q, rk, id, s) =>
      val e = expected.find(x => x._1 == q && x._2 == rk).get
      assert(java.lang.Double.compare(s, e._4) == 0, s"score $q/$rk/$id")
    }
  }

  test("X69: both retrievers contribute — some fused doc is dense-only "
    + "or lex-only") {
    val got = Hybrid.hybridRrf(spark, sfDir).collect()
    assert(got.exists(r => r.isNullAt(3) || r.isNullAt(4)),
      "fusion includes single-list docs")
    assert(got.exists(r => !r.isNullAt(3) && !r.isNullAt(4)),
      "fusion includes both-list docs")
  }
}
