package graft

import graft.ops.{QuantileSketch, SampleAgg}

/** X144 (batch half) — the bounded sample aggregator: sample and full
  * output bit-equal to X135's window path on the real corpus (the
  * payload-carrying bottom-k law; the oracle re-proves it
  * cross-engine), buffer boundedness above capacity, below-capacity
  * losslessness, and partition-count invariance (merge-order
  * independence).
  */
class SampleAggSpec extends SparkSpec {

  import spark.implicits._

  private def corpus = Tables.documents(spark, sfDir).select(
    $"source".as("grp"), $"doc_id".as("id"), $"n_chars".as("v"))

  test("X144: aggregator sample equals X135's window sample") {
    val agg = SampleAgg.sampleFromAgg(corpus)
      .orderBy($"grp", $"id").collect().map(_.toString).toSeq
    val win = QuantileSketch.sampleOf(corpus)
      .orderBy($"grp", $"id").collect().map(_.toString).toSeq
    assert(agg == win,
      "bounded-aggregator sample must equal the rank-window sample")
  }

  test("X144: full output equals X135's on the corpus") {
    val agg = SampleAgg.sampleAgg(spark, sfDir)
      .collect().map(_.toString).toSeq
    val win = QuantileSketch.quantileSketch(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(agg == win)
  }

  test("X144: buffer stays bounded above capacity; lossless below") {
    val big = (1L to 500L).map(i => ("g", i, i * 3L)).toDF("grp", "id", "v")
    val r = SampleAgg.aggOf(big).collect()(0)
    assert(r.getAs[Long]("n_rows") == 500L)
    assert(r.getAs[Long]("k_used") == SampleAgg.K.toLong)
    val small = (1L to 10L).map(i => ("g", i, i * 3L)).toDF("grp", "id", "v")
    val s = SampleAgg.aggOf(small).collect()(0)
    // below capacity the sample IS the group: est == exact
    QuantileSketch.Qs.foreach { q =>
      assert(s.getAs[Long](s"est_p$q") == s.getAs[Long](s"exact_p$q"),
        s"p$q must be exact below capacity")
    }
  }

  test("X144: partition-count invariance (merge-order independence)") {
    val one = SampleAgg.aggOf(corpus).collect().map(_.toString).toSeq
    val many = SampleAgg.aggOf(corpus.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
