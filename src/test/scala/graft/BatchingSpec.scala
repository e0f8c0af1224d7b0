package graft

import org.apache.spark.sql.functions._

import graft.ops.Batching

/** X80 — length-bucketed batch planner: ledger conservation, batch-size
  * contract, bucket ordering, and the padding arithmetic.
  */
class BatchingSpec extends SparkSpec {

  private lazy val rows =
    Batching.lengthBucketBatches(spark, sfDir).collect()

  test("X80: every document lands in exactly one batch (conservation)") {
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
  }

  test("X80: every batch is full except possibly the last per bucket") {
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (b, batches) =>
      val sorted = batches.sortBy(_.getAs[Long]("batch_id"))
      assert(sorted.map(_.getAs[Long]("batch_id")).toSeq ==
        sorted.indices.map(_.toLong), s"bucket $b: batch ids must be gap-free")
      sorted.init.foreach { r =>
        assert(r.getAs[Long]("n_docs") == Batching.BatchSize,
          s"bucket $b batch ${r.getAs[Long]("batch_id")}: " +
            s"non-final batch must be full")
      }
      assert(sorted.last.getAs[Long]("n_docs") <= Batching.BatchSize)
    }
  }

  test("X80: buckets and batches are length-ordered, and padding_frac " +
    "is the exact ledger arithmetic in [0, 1)") {
    // within a bucket, batches are cut from the length-sorted order, so
    // consecutive batches' [min_len, max_len] ranges never overlap
    // backwards; across buckets the boundary percentiles keep bucket
    // k's max <= bucket k+1's min only up to boundary ties, so assert
    // the per-bucket monotonicity (the contract the loader relies on)
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (b, batches) =>
      val sorted = batches.sortBy(_.getAs[Long]("batch_id"))
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        assert(pair(0).getAs[Long]("max_len") <= pair(1).getAs[Long]("min_len"),
          s"bucket $b: batch ranges must be non-decreasing")
      }
    }
    rows.foreach { r =>
      val padded = r.getAs[Long]("max_len") * r.getAs[Long]("n_docs")
      val frac = r.getAs[Double]("padding_frac")
      val expect = (padded - r.getAs[Long]("sum_tokens")).toDouble / padded
      assert(frac == expect, "padding_frac must be the exact division")
      assert(frac >= 0.0 && frac < 1.0)
      assert(r.getAs[Long]("min_len") <= r.getAs[Long]("max_len"))
    }
    // the whole point: bucketing beats one global batch order on padding.
    // Compare total pad tokens against the same batches cut from an
    // UNSORTED (doc_id) order.
    import spark.implicits._
    val byId = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy($"doc_id".asc)
    val naive = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("batch_id",
        floor((row_number().over(byId) - 1) / Batching.BatchSize))
      .groupBy($"batch_id")
      .agg((max($"n_tokens") * count(lit(1)) - sum($"n_tokens")).as("pad"))
      .agg(sum($"pad")).collect()(0).getLong(0)
    val bucketedPad = rows
      .map(r => r.getAs[Long]("max_len") * r.getAs[Long]("n_docs")
        - r.getAs[Long]("sum_tokens")).sum
    info(s"pad tokens: bucketed=$bucketedPad vs doc_id-order=$naive")
    assert(bucketedPad < naive,
      "length bucketing must reduce padding vs arrival order")
  }
}
