package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing
import graft.ops.Hll

/** X140 — explicit-register HLL: exact driver-side register/S/estimate
  * replay on the corpus, the element-wise-MAX shard merge law,
  * duplicate insensitivity (no upstream distinct needed), the
  * small-range linear-counting branch, partition-count invariance, and
  * the measured error band.
  */
class HllSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Tables.documents(spark, sfDir)
    .select($"source".as("grp"), $"text".as("v"))

  test("X140: exact driver-side register and estimate replay") {
    val hashes = corpus
      .select($"grp", Hashing.md5Long40($"v").as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val regs = hashes
      .map { case (g, h) =>
        val w = h >> 6
        val rho =
          if (w == 0L) 35L
          else 35L - (64 - java.lang.Long.numberOfLeadingZeros(w))
        ((g, h & 63L), rho)
      }
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }
    val expected = regs.toSeq.groupBy(_._1._1).map { case (g, rs) =>
      val ms = rs.map(_._2)
      val vZero = Hll.M - ms.size
      val s = ms.map(m => 1.0 / (1L << m).toDouble).sum + vZero.toDouble
      g -> (ms.size.toLong, vZero.toLong, s,
        Hll.Alpha * (Hll.M * Hll.M).toDouble / s)
    }
    val got = Hll.hllRegisters(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { r =>
      val (nRegs, vZero, s, estRaw) = expected(r.getString(0))
      assert(r.getAs[Long]("n_regs") == nRegs)
      assert(r.getAs[Long]("v_zero") == vZero)
      assert(r.getAs[Double]("s_sum") == s, s"S mismatch for ${r.get(0)}")
      assert(r.getAs[Double]("est_raw") == estRaw)
    }
  }

  test("X140: shard registers merge by element-wise max") {
    val docs = Tables.documents(spark, sfDir)
    val a = docs.filter($"doc_id" % 2 === 0)
      .select($"source".as("grp"), $"text".as("v"))
    val b = docs.filter($"doc_id" % 2 =!= 0)
      .select($"source".as("grp"), $"text".as("v"))
    val merged = Hll.regsOf(a).union(Hll.regsOf(b))
      .groupBy($"grp", $"j").agg(max($"m").as("m"))
    val direct = Hll.regsOf(corpus)
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "max-merged shard registers must equal the direct registers")
    val viaMerge = Hll.estimateOf(merged).orderBy($"grp")
      .collect().map(_.toString).toSeq
    val viaDirect = Hll.estimateOf(direct).orderBy($"grp")
      .collect().map(_.toString).toSeq
    assert(viaMerge == viaDirect)
  }

  test("X140: duplicates collapse inside the aggregate (max idempotent)") {
    val rows = (1L to 80L).map(i => ("g", s"content-$i")).toDF("grp", "v")
    val tripled = rows.union(rows).union(rows)
    assert(Hll.hllOf(rows).collect().map(_.toString).toSeq ==
      Hll.hllOf(tripled).collect().map(_.toString).toSeq)
  }

  test("X140: small-range linear-counting branch engages and is accurate") {
    val rows = (1L to 10L).map(i => ("g", s"doc-$i")).toDF("grp", "v")
    val r = Hll.hllOf(rows).collect()(0)
    assert(r.getAs[Long]("v_zero") > 0L)
    assert(r.getAs[Double]("est_raw") <= 2.5 * Hll.M,
      "fixture must sit in the small-range regime")
    val est = r.getAs[Double]("est")
    assert(est != r.getAs[Double]("est_raw"),
      "the linear-counting correction must have replaced the raw estimate")
    assert(math.abs(est - 10.0) / 10.0 < 0.35,
      s"linear counting should be close at n=10, got $est")
  }

  test("X140: partition-count invariance") {
    val one = Hll.hllOf(corpus).collect().map(_.toString).toSeq
    val many = Hll.hllOf(corpus.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }

  test("X140: estimate stays inside the m=64 error band on the corpus") {
    Hll.hllRegisters(spark, sfDir).collect().foreach { r =>
      val n = r.getAs[Long]("n_distinct").toDouble
      val est = r.getAs[Double]("est")
      val rel = math.abs(est - n) / n
      assert(rel < 0.5,
        s"source ${r.get(0)}: est $est vs exact $n (rel $rel) outside band")
    }
  }
}
