package graft

import org.apache.spark.sql.functions._

import graft.ops.{IndexStore, IndexVersions, LloydIvfPq}

/** X183 — versioned index retrain: v1 is exactly the shipped x178
  * probe, v2 retrains on corpus ∪ ingested batch with frozen-encode
  * seed cells, and both versions persist under separate roots and stay
  * queryable side by side.
  */
class IndexVersionsSpec extends SparkSpec {

  import spark.implicits._

  test("X183: registered query is both versions' probes, tagged and " +
    "ordered; v1 equals the shipped x178 probe verbatim") {
    val rows = SparkEntry.queries("x183_index_versions")(spark, sfDir)
    assert(rows.columns.toSeq ==
      Seq("version", "query_id", "rnk", "vec_id", "cos_sim"))
    val collected = rows.collect()
    val byVersion = collected.groupBy(_.getAs[String]("version"))
    assert(byVersion.keySet == Set("v1", "v2"))
    assert(byVersion("v1").length == 5 * LloydIvfPq.NQueries)
    assert(byVersion("v2").length == 5 * LloydIvfPq.NQueries)
    val v1Rows = byVersion("v1")
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSet
    val shipped = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rnk"),
        r.getAs[Long]("vec_id"), r.getAs[Double]("cos_sim"))).toSet
    assert(v1Rows == shipped,
      "v1 must be the shipped index's probe, bit-for-bit")
  }

  test("X183: the retrain absorbs the ingested batch — grown corpus, " +
    "offset ids, frozen-encode seed cells") {
    val v2 = IndexVersions.retrainedIndex(spark, sfDir)
    val n = Tables.embeddings(spark, sfDir).count()
    assert(v2.encoded.count() == 2 * n,
      "v2 trains on corpus + one ingested arrival per corpus vector")
    assert(v2.encoded
      .filter($"vec_id" >= IndexVersions.ArrivalOffset).count() == n,
      "every arrival id sits above the offset")
    // the seed rows really are the frozen v1 assignment of the
    // drifted batch (X180's encode) — recompute independently
    val v1 = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val seeds = IndexVersions.ingestedSeedRows(spark, sfDir)
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recomputed = graft.stream.StreamIndexIngest.encodeArrivals(
      graft.ops.IndexStaleness.driftedArrivals(
        Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")),
      graft.stream.StreamIndexIngest.centroidRow(v1.centroids),
      graft.stream.StreamIndexIngest.codebookFlatRow(v1.codebooks))
      .select($"vec_id", $"cell").collect()
      .map(r => (r.getLong(0) + IndexVersions.ArrivalOffset) -> r.getLong(1))
      .toMap
    assert(seeds == recomputed,
      "retrain seeds must be the frozen-artifact ingest assignment")
  }

  test("X183: both versions persist under separate roots and the " +
    "reloaded probes equal the in-session ones — yesterday's codebooks " +
    "stay queryable while tonight's build lands") {
    val v1 = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val v2 = IndexVersions.retrainedIndex(spark, sfDir)
    val r1 = s"target/index_versions_spec/v1"
    val r2 = s"target/index_versions_spec/v2"
    IndexStore.writeIvfPq(v1, r1)
    IndexStore.writeIvfPq(v2, r2)
    def probeOf(root: String) =
      LloydIvfPq.probe(IndexStore.readIvfPq(spark, root))
        .collect().map(_.toString).toSeq
    assert(probeOf(r1) ==
      LloydIvfPq.probe(v1).collect().map(_.toString).toSeq)
    assert(probeOf(r2) ==
      LloydIvfPq.probe(v2).collect().map(_.toString).toSeq)
    // and the two artifacts are genuinely different indexes (the
    // retrain moved parameters — else versioning would be vacuous)
    val cb1 = spark.read.parquet(s"$r1/codebooks")
      .collect().map(_.toString).toSet
    val cb2 = spark.read.parquet(s"$r2/codebooks")
      .collect().map(_.toString).toSet
    assert(cb1 != cb2, "the retrain must move the residual codebooks")
  }
}
