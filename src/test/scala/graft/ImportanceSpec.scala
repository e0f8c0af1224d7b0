package graft

import graft.ops.Importance

/** X142 — DSIR-style whole-bit importance weights: target ≡ raw gives
  * exactly zero everywhere, a hand-computed two-bucket fixture,
  * target-likeness direction on a planted fixture, exact driver-side
  * i64 corpus replay, and partition invariance.
  */
class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  test("X142: target distribution == raw distribution gives all-zero weights") {
    val docs = (1L to 30L)
      .map(i => (i, "en", s"alpha beta gamma-$i delta"))
      .toDF("doc_id", "lang", "text")
    val out = Importance.weightsOf(docs).collect()
    assert(out.length == 30)
    out.foreach(r => assert(r.getAs[Long]("w_bits") == 0L,
      s"doc ${r.get(0)} expected 0, got ${r.get(2)}"))
  }

  test("X142: hand-computed weights on a planted two-word corpus") {
    // 3 en docs of only "aa", 1 fr doc of only "bb"; one token each.
    // R = 4, T = 3, B = 4096.
    // bucket(aa): r = 3, t = 3 -> w = bitlen(4) + bitlen(4100)
    //   - bitlen(4) - bitlen(4099) = 3 + 13 - 3 - 13 = 0
    // bucket(bb): r = 1, t = 0 -> w = bitlen(1) + bitlen(4100)
    //   - bitlen(2) - bitlen(4099) = 1 + 13 - 2 - 13 = -1
    val docs = Seq(
      (1L, "en", "aa"), (2L, "en", "aa"), (3L, "en", "aa"),
      (4L, "fr", "bb")).toDF("doc_id", "lang", "text")
    val out = Importance.weightsOf(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("w_bits")).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> -1L))
  }

  test("X142: target-exclusive vocabulary outscores raw-exclusive") {
    val en = (1L to 20L).map(i => (i, "en", "wiki prose sentence here"))
    val fr = (21L to 40L).map(i => (i, "fr", "menu cookie accept clic"))
    val out = Importance.weightsOf((en ++ fr).toDF("doc_id", "lang", "text"))
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("w_bits")).toMap
    val enScore = out(1L)
    val frScore = out(21L)
    assert(enScore > frScore,
      s"target-like doc ($enScore) must outscore raw-only doc ($frScore)")
  }

  test("X142: exact driver-side i64 corpus replay") {
    val docs = Tables.documents(spark, sfDir)
    val raw0 = docs.select($"doc_id", $"lang", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val tok = raw0.flatMap { case (id, lang, text) =>
      text.toLowerCase.split("\\s+").filter(_.nonEmpty).map { w =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8"))
        val h = (8 until 13).map(i => (d(i) & 0xffL) << (8 * (i - 8))).sum
        (id, lang, h & (Importance.B - 1).toLong)
      }
    }
    val r = tok.groupBy(_._3).map { case (b, x) => b -> x.length.toLong }
    val t = tok.filter(_._2 == Importance.TargetLang)
      .groupBy(_._3).map { case (b, x) => b -> x.length.toLong }
    val bigR = tok.length.toLong
    val bigT = tok.count(_._2 == Importance.TargetLang).toLong
    val w = r.map { case (b, rb) =>
      b -> (bitlen(t.getOrElse(b, 0L) + 1) + bitlen(bigR + Importance.B) -
        bitlen(rb + 1) - bitlen(bigT + Importance.B))
    }
    val expected = tok.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.length.toLong, xs.map(x => w(x._3)).sum)
    }
    val got = Importance.importanceWeights(spark, sfDir).collect()
    assert(got.length == expected.size)
    got.foreach { row =>
      val (nf, wb) = expected(row.getLong(0))
      assert(row.getAs[Long]("n_feats") == nf)
      assert(row.getAs[Long]("w_bits") == wb,
        s"doc ${row.get(0)}: expected $wb got ${row.get(2)}")
    }
  }

  test("X142: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"lang", $"text")
    val one = Importance.weightsOf(docs).collect().map(_.toString).toSeq
    val many = Importance.weightsOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
