package graft

import org.apache.spark.sql.functions._

import graft.ops.{Calibration, Dedup}

/** X65 — MinHash calibration: the rollup must equal a driver-side
  * recompute from the signature table and exact shingle sets, cover
  * ALL candidates (no Jaccard floor), and key its buckets by the
  * integer component-match count.
  */
class CalibrationSpec extends SparkSpec {

  test("X65: rollup equals driver-side recompute over all candidates") {
    import spark.implicits._
    val sh = Dedup.shinglesOf(Tables.documents(spark, sfDir))
    val sets = sh.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val sig = Dedup.minhashSignatures(sh)
    val sigRows = sig.collect().map { r =>
      r.getLong(0) -> (0 until Dedup.nHashes)
        .map(j => r.getAs[Long](s"m$j")).toVector
    }.toMap
    val cand = Dedup.minhashCandidates(sig).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.nonEmpty)

    val perPair = cand.map { case (a, b) =>
      val nMatch = sigRows(a).zip(sigRows(b)).count(p => p._1 == p._2)
      val i = (sets(a) & sets(b)).size.toLong
      val u = sets(a).size.toLong + sets(b).size.toLong - i
      (nMatch.toLong, i, u, i.toDouble / u.toDouble)
    }
    val expected = perPair.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong,
        xs.map(_._2).sum.toDouble / xs.map(_._3).sum.toDouble,
        xs.map(_._4).min, xs.map(_._4).max)
    }.toMap

    val got = Calibration.minhashCalibration(spark, sfDir).collect()
    assert(got.map(_.getLong(0)).toSet == expected.keySet)
    assert(got.map(_.getLong(2)).sum == cand.length.toLong,
      "covers every candidate — no Jaccard floor")
    got.foreach { r =>
      val k = r.getLong(0)
      assert(k >= 0 && k <= Dedup.nHashes.toLong)
      assert(java.lang.Double.compare(r.getDouble(1),
        k.toDouble / Dedup.nHashes) == 0, s"est bucket $k")
      val (n, pooled, mn, mx) = expected(k)
      assert(r.getLong(2) == n, s"n_pairs bucket $k")
      assert(java.lang.Double.compare(r.getDouble(3), pooled) == 0,
        s"pooled bucket $k")
      assert(java.lang.Double.compare(r.getDouble(4), mn) == 0 &&
        java.lang.Double.compare(r.getDouble(5), mx) == 0,
        s"min/max bucket $k")
    }
  }

  test("X65: estimate tracks exact similarity across the spectrum") {
    val rows = Calibration.minhashCalibration(spark, sfDir).collect()
      .sortBy(_.getLong(0))
    assert(rows.head.getDouble(3) <= rows.last.getDouble(3),
      "pooled exact Jaccard rises from lowest to highest bucket")
  }
}
