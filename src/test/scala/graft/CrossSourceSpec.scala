package graft

import graft.ops.{CrossSource, Dedup}

/** X60 — cross-source duplication matrix: must equal the driver-side
  * attribution of the X2 pair set, with normalized orientation and the
  * exact pooled-Jaccard identity.
  */
class CrossSourceSpec extends SparkSpec {

  test("X60: matrix equals driver-side attribution of the X2 pairs") {
    val srcOf = Tables.documents(spark, sfDir)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashPairs(
      Dedup.shinglesOf(Tables.documents(spark, sfDir))).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_sh_a"), r.getAs[Long]("n_sh_b"),
        r.getAs[Long]("n_common")))
    assert(pairs.nonEmpty)

    val expected = pairs.groupBy { case (a, b, _, _, _) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.map { case (k, xs) =>
      val common = xs.map(_._5).sum
      val union = xs.map(x => x._3 + x._4 - x._5).sum
      k -> ((xs.length.toLong, common, union,
        common.toDouble / union.toDouble))
    }

    val got = CrossSource.crossSourceDups(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("common_shingles"),
          r.getAs[Long]("union_shingles"), r.getAs[Double]("pooled_jaccard"))))
      .toMap
    assert(got == expected)
    got.keys.foreach { case (a, b) =>
      assert(a <= b, s"orientation must be normalized: ($a, $b)")
    }
  }
}
