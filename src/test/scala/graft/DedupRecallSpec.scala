package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, DedupRecall}

/** X146 — dedup-recall audit: exact duplicates are always found
  * (identical signatures collide in every band), the truth side is
  * lossless above the floor (driver-side brute-force replay on a
  * fixture), found ≤ truth per band with the top band near-perfect on
  * the corpus, and partition invariance.
  */
class DedupRecallSpec extends SparkSpec {

  import spark.implicits._

  test("X146: planted exact duplicate lands in the top band and is found") {
    // doc 11 is a probe (11 % 11 == 0); doc 12 is its exact duplicate
    val texts = Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta"),
      (13L, "unrelated words entirely different content here now"))
      .toDF("doc_id", "text")
    val out = DedupRecall.recallOf(Dedup.shinglesOf(texts)).collect()
    val top = out.find(_.getAs[Long]("band") == 3L)
    assert(top.isDefined, "the exact-dup pair must land in band 3")
    assert(top.get.getAs[Long]("n_truth") == 1L)
    assert(top.get.getAs[Long]("n_found") == 1L)
    assert(top.get.getAs[Double]("recall") == 1.0)
  }

  test("X146: truth side is lossless above the floor (brute-force replay)") {
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").limit(60)
    val sh = Dedup.shinglesOf(docs)
    val truthBands = DedupRecall.recallOf(sh)
      .agg(sum($"n_truth")).collect()(0).getLong(0)
    // driver-side brute force over ALL pairs touching the probe slice
    val sets = sh.collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).toSet }
    val ids = sets.keys.toSeq.sorted
    var n = 0
    for {
      a <- ids; b <- ids if a < b
      if a % DedupRecall.ProbeMod == 0 || b % DedupRecall.ProbeMod == 0
    } {
      val inter = (sets(a) & sets(b)).size
      val j = inter.toDouble / (sets(a).size + sets(b).size - inter)
      if (j >= DedupRecall.MinJaccard) n += 1
    }
    val got = DedupRecall.recallOf(sh)
      .agg(sum($"n_truth")).collect()(0).getLong(0)
    assert(got == n.toLong,
      s"truth pairs: query says $got, brute force says $n")
    assert(truthBands == got)
  }

  test("X146: found never exceeds truth; top band near-perfect on corpus") {
    val out = DedupRecall.dedupRecall(spark, sfDir).collect()
    assert(out.nonEmpty, "corpus must produce truth pairs above the floor")
    out.foreach { r =>
      assert(r.getAs[Long]("n_found") <= r.getAs[Long]("n_truth"))
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    out.find(_.getAs[Long]("band") == 3L).foreach { top =>
      assert(top.getAs[Double]("recall") >= 0.9,
        s"band-3 recall ${top.get(4)} below the 1-(1-j^2)^8 expectation")
    }
  }

  test("X146: partition-count invariance") {
    val sh = Dedup.shinglesOf(
      Tables.documents(spark, sfDir).select($"doc_id", $"text"))
    val one = DedupRecall.recallOf(sh).collect().map(_.toString).toSeq
    val many = DedupRecall.recallOf(sh.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
