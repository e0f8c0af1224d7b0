package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.EpochShuffle

/** X42 — epoch shuffle: permutation validity, epoch independence,
  * determinism, the one-exchange plan shape, and the shard-file layout
  * of the write seam.
  */
class EpochShuffleSpec extends SparkSpec {

  test("X42: each epoch is a valid shard-partitioned permutation") {
    import spark.implicits._
    val out = EpochShuffle.epochShuffle(spark, sfDir).collect()
    val docs = Tables.documents(spark, sfDir).count()
    assert(out.length == docs, "every document appears exactly once")
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length == out.length)
    out.groupBy(_.getAs[Long]("shard")).foreach { case (s, rs) =>
      assert(s >= 0 && s < EpochShuffle.NumShards)
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to rs.length.toLong),
        s"shard $s positions must be dense 1..${rs.length}")
    }
  }

  test("X42: reproducible within an epoch, unrelated across epochs") {
    val docs = Tables.documents(spark, sfDir)
    val e1a = EpochShuffle.shuffleOf(docs, 1, 16).collect()
    val e1b = EpochShuffle.shuffleOf(docs, 1, 16).collect()
    assert(e1a.sameElements(e1b), "same epoch ⇒ identical layout")
    val e2 = EpochShuffle.shuffleOf(docs, 2, 16)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap
    val moved = e1a.count { r =>
      e2(r.getAs[Long]("doc_id")) !=
        (r.getAs[Long]("shard"), r.getAs[Long]("pos"))
    }
    assert(moved > e1a.length / 2,
      s"epoch change must re-permute most documents, moved only $moved")
  }

  test("X42: plan is one shard exchange + local sort, no rand") {
    val plan = EpochShuffle.epochShuffle(spark, sfDir)
      .queryExecution.executedPlan.toString
    val hashExchanges = plan.linesIterator
      .count(_.contains("Exchange hashpartitioning"))
    assert(hashExchanges == 1,
      s"expected the single shard shuffle, got $hashExchanges:\n$plan")
    assert(!plan.toLowerCase.contains("rand"),
      "layout must be hash-derived, never rand()")
  }

  test("X42: write seam lays out sorted shard files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("epoch_shuffle").toString
    EpochShuffle.epochShuffleWrite(
      Tables.documents(spark, sfDir), epoch = 3, shards = 8, s"$dir/e3")
    val back = spark.read.parquet(s"$dir/e3")
      .withColumn("file", input_file_name())
      .select($"file", $"shard", $"ord", $"doc_id")
      .collect()
    assert(back.map(_.getAs[Long]("doc_id")).distinct.length == back.length)
    back.groupBy(_.getAs[String]("file")).foreach { case (f, rs) =>
      val keys = rs.map(r => (r.getAs[Long]("ord"), r.getAs[Long]("doc_id")))
      assert(keys.sameElements(keys.sorted),
        s"file $f must be internally sorted by (ord, doc_id)")
    }
  }
}
