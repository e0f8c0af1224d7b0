package graft

import graft.ops.{Kmv, KmvAgg}

/** X139 (batch half) — the bounded KMV aggregator: aggregator ≡ window
  * path on the real corpus (the engine-side distinct-bottom-k law; the
  * oracle re-proves it cross-engine), internal dedup (raw rows ≡
  * pre-distincted rows), buffer boundedness above capacity, and
  * partition-count invariance (merge-order independence).
  */
class KmvAggSpec extends SparkSpec {

  import spark.implicits._

  test("X139: aggregator path equals X134's window path on the corpus") {
    val agg = KmvAgg.kmvAgg(spark, sfDir).collect().map(_.toString).toSeq
    val win = Kmv.kmvDistinctContent(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(agg == win,
      "bounded-aggregator KMV must equal the rank-window KMV")
  }

  test("X139: dedup is internal — raw rows equal pre-distincted rows") {
    val rows = (1L to 50L).flatMap(i =>
      Seq.fill(3)(("g", s"content-$i"))).toDF("grp", "v")
    val raw = KmvAgg.aggOf(rows).collect().map(_.toString).toSeq
    val dis = KmvAgg.aggOf(rows.distinct()).collect().map(_.toString).toSeq
    assert(raw == dis)
    assert(KmvAgg.aggOf(rows).collect()(0).getAs[Long]("n_distinct") == 50L)
  }

  test("X139: buffer stays bounded above capacity") {
    val rows = (1L to 500L).map(i => ("g", s"doc-$i")).toDF("grp", "v")
    val r = KmvAgg.aggOf(rows).collect()(0)
    assert(r.getAs[Long]("n_distinct") == 500L)
    assert(r.getAs[Long]("k_used") == KmvAgg.K.toLong,
      "above capacity the sketch must hold exactly K hashes")
    assert(r.getAs[Double]("est_q") > 0.0)
  }

  test("X139: partition-count invariance (merge-order independence)") {
    val docs = Tables.documents(spark, sfDir).select(
      $"source".as("grp"), $"text".as("v"))
    val one = KmvAgg.aggOf(docs).collect().map(_.toString).toSeq
    val many = KmvAgg.aggOf(docs.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
