package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.ops.Dedup
import graft.stream.StreamDedup

/** Streaming incremental near-dup: the row-local signature build is
  * bit-equal to batch X2's aggregated signatures, and the stateful bucket
  * matcher finds exactly the batch LSH candidate set — including pairs
  * whose members arrive in different micro-batches.
  */
class StreamDedupSpec extends SparkSpec {

  test("signatures: the row-local streaming build equals batch X2's aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val batch = Dedup.minhashSignatures(Dedup.shinglesOf(docs))
      .select($"doc_id", array((0 until Dedup.nHashes).map(j => col(s"m$j")): _*).as("bsig"))
    val stream = StreamDedup.signatures(docs).select($"doc_id", $"sig")
    val joined = batch.join(stream, "doc_id")
    assert(joined.count() == docs.count(),
      "every doc with shingles must appear in both signature builds")
    assert(joined.filter(not($"bsig" <=> $"sig")).isEmpty,
      "streaming and batch signatures must be bit-identical per doc")
  }

  test("MinHashSig native expression is bit-equal to the per-band lambda form") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.functions.Hashing.{md5Long40, minHashSig, minHashSigHof}
    // real shingle hashes + adversarial synthetic arrays (null elements,
    // single element, extreme values)
    val real = Dedup.shinglesOf(Tables.documents(spark, sfDir))
      .groupBy($"doc_id").agg(collect_list(md5Long40($"sh")).as("hs"))
    val synth = Seq(
      Seq[java.lang.Long](0L, (1L << 40) - 1, 12345L),
      Seq[java.lang.Long](7L),
      Seq[java.lang.Long](null, 42L, null)
    ).toDF("hs")
    for (df <- Seq(real.select($"hs"), synth)) {
      val mism = df.select(
        minHashSig($"hs", Dedup.A.toSeq, Dedup.B.toSeq, Dedup.P).as("native"),
        minHashSigHof($"hs", Dedup.A.toSeq, Dedup.B.toSeq, Dedup.P).as("lambda"))
        .filter(not($"native" <=> $"lambda"))
      assert(mism.isEmpty, "native and lambda signatures must agree")
    }
    // documented divergence: empty / all-null arrays → native null, and
    // a null array propagates
    val edge = Seq(Seq.empty[java.lang.Long], null)
      .toDF("hs")
      .select(minHashSig($"hs", Dedup.A.toSeq, Dedup.B.toSeq, Dedup.P).as("s"))
      .collect()
    assert(edge.forall(_.isNullAt(0)))
  }

  test("incremental matching equals the batch candidate set, across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select($"doc_id", $"text").orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // batch oracle: the LSH candidate pairs over the full doc set
    val expected = Dedup.minhashCandidates(
      Dedup.minhashSignatures(Dedup.shinglesOf(
        docs.toSeq.toDF("doc_id", "text"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "testdata must contain near-dup candidates")

    val (first, second) = docs.splitAt(docs.length / 2)
    val input = MemoryStream[(Long, String)]
    val query = StreamDedup.nearDupCandidates(
      input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pairs").start()
    try {
      input.addData(first.toSeq)
      query.processAllAvailable()
      val afterFirst = spark.table("stream_pairs").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      input.addData(second.toSeq)
      query.processAllAvailable()
      val rows = spark.table("stream_pairs").collect()
      val got = rows.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // a pair shared by several bands is emitted once per bucket; the
      // deduped set must be exactly the batch candidate set
      assert(got == expected,
        s"missing=${expected -- got} spurious=${got -- expected}")
      // the split must exercise cross-batch pairing: some pair completed
      // only when its second member arrived in micro-batch 2
      val firstIds = first.map(_._1).toSet
      assert((got -- afterFirst).exists { case (a, b) =>
        firstIds(a) ^ firstIds(b)
      }, "no pair straddled the two micro-batches — split not exercised")
      // agreement estimate is sane: all 16 components agree on identical sigs
      rows.foreach { r =>
        val est = r.getAs[Double]("est_jaccard")
        assert(est >= 0.0 && est <= 1.0)
        assert(math.abs(est - r.getAs[Int]("n_agree") / 16.0) < 1e-12)
      }
    } finally query.stop()
  }

  test("stream candidates + batch exact verification == batch X2 end to end") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val input = MemoryStream[(Long, String)]
    val query = StreamDedup.nearDupCandidates(
      input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("append")
      .format("memory").queryName("verify_pairs").start()
    try {
      input.addData(docs.collect().map(r => (r.getLong(0), r.getString(1))).toSeq)
      query.processAllAvailable()
    } finally query.stop()
    // the documented downstream step: dedup the emitted candidates and
    // verify them exactly against the shingle store
    val cand = spark.table("verify_pairs")
      .select($"doc_a", $"doc_b").distinct()
    val sh = Dedup.shinglesOf(docs).cache()
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val verified = Dedup.exactJaccard(cand, sh, sizes)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = Dedup.minhashLsh(spark, sfDir)
      .select($"doc_a", $"doc_b", $"jaccard")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(verified == batch,
      "streaming candidates verified in batch must reproduce batch X2 exactly")
    assert(batch.nonEmpty)
  }

  test("bucket state is bounded: a hot bucket caps members and stays alive") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // identical docs all land in the same 8 buckets; with maxPerBucket=4
    // each arrival pairs against at most 4 retained members
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val input = MemoryStream[(Long, String)]
    val query = StreamDedup.nearDupCandidates(
      input.toDF().toDF("doc_id", "text"), maxPerBucket = 4)
      .writeStream.outputMode("append")
      .format("memory").queryName("hot_bucket").start()
    try {
      input.addData((1L to 10L).map(i => (i, text)))
      query.processAllAvailable()
      val got = spark.table("hot_bucket").collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
      // doc i pairs with min(i-1, 4) retained members, per shared bucket →
      // deduped pair count = sum_{i=2..10} min(i-1, 4) = 1+2+3+4*7 ... with
      // eviction of OLDEST members, high doc_ids never pair with doc 1
      assert(got.size == (1 to 9).map(k => math.min(k, 4)).sum,
        s"got ${got.size} pairs: $got")
      assert(!got.contains((1L, 10L)),
        "doc 1 must have been evicted from the bucket before doc 10 arrived")
      // every emitted pair of identical docs agrees on all 16 components
      spark.table("hot_bucket").collect().foreach { r =>
        assert(r.getAs[Int]("n_agree") == Dedup.nHashes)
      }
    } finally query.stop()
  }
}
