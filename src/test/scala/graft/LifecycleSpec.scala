package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.{ArtifactRetention, IndexCompaction, IndexStore,
  LloydIvfPq}
import graft.stream.StreamIndexIngest

/** The index-family lifecycle GOLDEN PATH — every maintenance edge the
  * X178–X187 family ships, composed end-to-end in one scenario over
  * real artifacts instead of each edge's isolated fixture:
  *
  *   build (x178) → persist (x179) → serve via alias (x184) →
  *   streamed arrival lands in the serving root (x180) →
  *   compaction + sequenced cutover (x185) →
  *   graceful retention sweep (x186/x187)
  *
  * Each edge's own spec pins its corner cases; what THIS suite pins is
  * that the edges compose: the probe served through the alias is
  * bit-equal at every step, the arrival ingested before compaction is
  * still ranked after cutover and after the sweep, the retired serving
  * root survives as the rollback sibling, and only the
  * previous-generation root (a different source fingerprint — outside
  * the rollback group, the exact case X187's grace exists for) is
  * reclaimed, and only after a full mark → grace → reclaim cycle.
  */
class LifecycleSpec extends SparkSpec {

  import spark.implicits._

  private val Key = "0" * 32
  private val FpA = "a" * 12
  private val FpPrev = "e" * 12

  test("X178→X187 lifecycle golden path: serve, ingest, compact, " +
    "cut over, then gracefully reclaim exactly the previous " +
    "generation") {
    val base = "target/lifecycle_spec/run_" +
      java.util.UUID.randomUUID().toString.take(8)
    val store = s"$base/store"
    Files.createDirectories(Paths.get(store))

    // ---- build + persist (x178/x179): the current-generation root --
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val rootV1 = s"$store/ivfpq_v3_${Key}_$FpA"
    IndexStore.writeIvfPq(built, rootV1)

    // ---- a PREVIOUS-generation artifact: same store, different
    // source fingerprint — what a source regen leaves behind. Old
    // enough that creation-age retention would reclaim it on sight.
    val rootPrev = s"$store/ivfpq_v3_${Key}_$FpPrev"
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(rootV1), new java.io.File(rootPrev))
    assert(new java.io.File(rootPrev).setLastModified(
      System.currentTimeMillis() - 3 * ArtifactRetention.SafetyWindowMs))

    // ---- serve (x184): the alias names the current generation ------
    val aliasP = Paths.get(store, "probe.serving")
    graft.ops.IndexAlias.writeAlias(aliasP,
      graft.ops.IndexAlias.Serving("v1", rootV1))
    def servedProbe(): Seq[String] = {
      val s = graft.ops.IndexAlias.readAlias(aliasP)
      LloydIvfPq.probe(IndexStore.readIvfPq(spark, s.root))
        .collect().map(_.toString).toSeq
    }
    val probe0 = servedProbe()
    assert(probe0.nonEmpty)

    // ---- ingest (x180): a near-duplicate of query 0 arrives and MUST
    // rank in the served probe from here to the end of the lifecycle
    val q0 = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" === 0L).select($"embedding")
      .collect().head.getSeq[Float](0).toArray
    val nv = q0.clone(); nv(0) = nv(0) + 1e-4f
    StreamIndexIngest.encodeArrivals(
      Seq((999990L, nv)).toDF("vec_id", "embedding"),
      StreamIndexIngest.centroidRow(built.centroids),
      StreamIndexIngest.codebookFlatRow(built.codebooks))
      .write.partitionBy("cell").mode("append").parquet(s"$rootV1/encoded")
    val probeGrown = servedProbe()
    assert(probeGrown != probe0 &&
      probeGrown.exists(_.contains("999990")),
      "the streamed arrival must be served immediately")

    // ---- first sweep (x186/x187): the previous generation is only
    // MARKED — a reader may still hold it — and serving is untouched
    val t0 = System.currentTimeMillis()
    val s1 = ArtifactRetention.sweep(store, nowMs = t0)
    assert(s1.deleted.isEmpty &&
      s1.pending == Seq(s"ivfpq_v3_${Key}_$FpPrev"),
      s"first observation marks the previous generation only, got $s1")
    assert(servedProbe() == probeGrown, "the sweep is probe-invisible")

    // ---- compact + cutover (x185): the fragmented serving root
    // compacts; the alias flips atomically to the compacted sibling
    val h = IndexCompaction.compactAndCutover(spark, aliasP, "v1",
      rootV1, s"${rootV1}_c1")
    assert(h.root == s"${rootV1}_c1")
    val probeCompacted = servedProbe()
    assert(probeCompacted == probeGrown,
      "compaction + cutover must be bit-invisible to the served probe")
    assert(IndexCompaction.fragmentation(h.root).forall(_._2 == 1))

    // ---- final sweep past the reader grace: EXACTLY the marked
    // previous generation goes; the retired rootV1 is the compacted
    // root's rollback sibling (same fingerprint group) and survives
    val s2 = ArtifactRetention.sweep(store,
      nowMs = t0 + ArtifactRetention.ReaderGraceMs)
    assert(s2.deleted == Seq(s"ivfpq_v3_${Key}_$FpPrev"),
      s"only the out-of-group previous generation is reclaimed, got $s2")
    assert(Files.exists(Paths.get(rootV1)),
      "the retired serving root is the rollback set — one flip away")
    assert(!Files.exists(
      ArtifactRetention.markerPath(store, s"ivfpq_v3_${Key}_$FpPrev")),
      "the marker leaves with its root")
    assert(servedProbe() == probeGrown,
      "the end-state probe still serves every arrival at its rank")

    // ---- terminal store state: serving + rollback + alias, no temp
    // dirs, no markers — the store the next lifecycle round inherits
    val names = new java.io.File(store).listFiles().map(_.getName).toSet
    assert(names == Set(s"ivfpq_v3_${Key}_$FpA",
      s"ivfpq_v3_${Key}_${FpA}_c1", "probe.serving"),
      s"terminal store must be exactly serving+rollback+alias, got $names")
  }
}
