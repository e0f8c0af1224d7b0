package graft

import graft.ops._

/** The driver contract itself: entry() smoke, oracle-key hygiene, and —
  * critically — that the per-module query maps never collide (`++` would
  * silently drop a query, which the driver would report as a missing
  * operator, not an error here).
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() answers with rows (the driver's t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("module query maps merge without collisions") {
    val moduleMaps = Seq(
      "Relational" -> Relational.queries, "Events" -> Events.queries,
      "Text" -> Text.queries, "Vector" -> Vector.queries,
      "Dedup" -> Dedup.queries, "Weather" -> Weather.queries,
      "Multimodal" -> Multimodal.queries, "AsOf" -> AsOf.queries,
      "Curation" -> Curation.queries, "Decontam" -> Decontam.queries,
      "Profile" -> Profile.queries, "Packing" -> Packing.queries,
      "Repetition" -> Repetition.queries, "Mixing" -> Mixing.queries,
      "Scrub" -> Scrub.queries, "SimHashDedup" -> SimHashDedup.queries,
      "Chunking" -> Chunking.queries, "Layout" -> Layout.queries,
      "Centroids" -> Centroids.queries, "Funnel" -> Funnel.queries,
      "EpochShuffle" -> EpochShuffle.queries,
      "InvertedIndex" -> InvertedIndex.queries,
      "Cooccur" -> Cooccur.queries, "Sketch" -> Sketch.queries,
      "Quantize" -> Quantize.queries, "LmScore" -> LmScore.queries,
      "Vocab" -> Vocab.queries,
      "Intervals" -> Intervals.queries, "Fuzzy" -> Fuzzy.queries,
      "Normalize" -> Normalize.queries, "Divergence" -> Divergence.queries,
      "SpanDedup" -> SpanDedup.queries, "Winsorize" -> Winsorize.queries,
      "Resample" -> Resample.queries, "Rolling" -> Rolling.queries,
      "IncrementalDedup" -> IncrementalDedup.queries,
      "CdcChunking" -> CdcChunking.queries, "Tokenizer" -> Tokenizer.queries,
      "RepeatSuppress" -> RepeatSuppress.queries, "Integrity" -> Integrity.queries,
      "CrossSource" -> CrossSource.queries, "Basket" -> Basket.queries,
      "SplitLeakage" -> SplitLeakage.queries,
      "Compaction" -> Compaction.queries, "PrefixJoin" -> PrefixJoin.queries,
      "Containment" -> Containment.queries,
      "EmbedProfile" -> EmbedProfile.queries,
      "Calibration" -> Calibration.queries,
      "Attribution" -> Attribution.queries, "SkewAudit" -> SkewAudit.queries,
      "SplitRepair" -> SplitRepair.queries,
      "QualityDedup" -> QualityDedup.queries, "Bm25" -> Bm25.queries,
      "Hybrid" -> Hybrid.queries,
      "Assign" -> Assign.queries, "Twa" -> Twa.queries,
      "Cascade" -> Cascade.queries, "Mode" -> Mode.queries,
      "Correlate" -> Correlate.queries,
      "SnapshotDiff" -> SnapshotDiff.queries,
      "IncrementalCc" -> IncrementalCc.queries,
      "Batching" -> Batching.queries, "Novelty" -> Novelty.queries,
      "Triangles" -> Triangles.queries,
      "ClusterShard" -> ClusterShard.queries,
      "PageRank" -> PageRank.queries, "PitJoin" -> PitJoin.queries,
      "ThresholdSweep" -> ThresholdSweep.queries,
      "IncrementalAgg" -> IncrementalAgg.queries,
      "QuantileNorm" -> QuantileNorm.queries,
      "Decay" -> Decay.queries, "BloomPrune" -> BloomPrune.queries,
      "Manifest" -> Manifest.queries,
      "GroupedTopK" -> GroupedTopK.queries, "BitSim" -> BitSim.queries,
      "SeqAssembly" -> SeqAssembly.queries, "Cusum" -> Cusum.queries,
      "KCore" -> KCore.queries, "Trend" -> Trend.queries,
      "PpsSample" -> PpsSample.queries, "Surprisal" -> Surprisal.queries,
      "LabelProp" -> LabelProp.queries, "IncScd2" -> IncScd2.queries,
      "RecallAudit" -> RecallAudit.queries,
      "Matryoshka" -> Matryoshka.queries,
      "LinkPredict" -> LinkPredict.queries, "Keywords" -> Keywords.queries,
      "SortedNeighborhood" -> SortedNeighborhood.queries,
      "Auc" -> Auc.queries, "Richness" -> Richness.queries,
      "Rendezvous" -> Rendezvous.queries, "Gini" -> Gini.queries,
      "Bpe" -> Bpe.queries, "Concentration" -> Concentration.queries,
      "Covariance" -> Covariance.queries,
      "FeatureHash" -> FeatureHash.queries,
      "Contingency" -> Contingency.queries, "Spearman" -> Spearman.queries,
      "KsDrift" -> KsDrift.queries, "EditDistance" -> EditDistance.queries,
      "PowerIteration" -> PowerIteration.queries,
      "RandIndex" -> RandIndex.queries, "Mmr" -> Mmr.queries,
      "Assortativity" -> Assortativity.queries,
      "Dispersion" -> Dispersion.queries,
      "Winnowing" -> Winnowing.queries,
      "InterArrival" -> InterArrival.queries,
      "PathMining" -> PathMining.queries, "Holdout" -> Holdout.queries,
      "RobustRange" -> RobustRange.queries,
      "Distinctive" -> Distinctive.queries, "Wilson" -> Wilson.queries,
      "PackSweep" -> PackSweep.queries, "LaggedXcorr" -> LaggedXcorr.queries,
      "Kmv" -> Kmv.queries,
      "QuantileSketch" -> QuantileSketch.queries,
      "AmsF2" -> AmsF2.queries,
      "ThetaOverlap" -> ThetaOverlap.queries,
      "SketchRollup" -> SketchRollup.queries,
      "KmvAgg" -> KmvAgg.queries,
      "Hll" -> Hll.queries,
      "Wasserstein" -> Wasserstein.queries,
      "Importance" -> Importance.queries,
      "SampleAgg" -> SampleAgg.queries,
      "SemDedup" -> SemDedup.queries,
      "DedupRecall" -> DedupRecall.queries,
      "JlProjection" -> JlProjection.queries,
      "SketchNovelty" -> SketchNovelty.queries,
      "Expectations" -> Expectations.queries,
      "CurationMix" -> CurationMix.queries, "Zipf" -> Zipf.queries,
      "Benford" -> Benford.queries, "Outlier" -> Outlier.queries,
      "Boilerplate" -> Boilerplate.queries, "Heaps" -> Heaps.queries,
      "JoinSize" -> JoinSize.queries,
      "CentroidDrift" -> CentroidDrift.queries, "Psi" -> Psi.queries,
      "Entropy" -> Entropy.queries, "FdAudit" -> FdAudit.queries,
      "LloydIvf" -> LloydIvf.queries, "RankDrift" -> RankDrift.queries,
      "MannKendall" -> MannKendall.queries,
      "ContaminationMatrix" -> ContaminationMatrix.queries,
      "LloydPq" -> LloydPq.queries,
      "ContaminationKmv" -> ContaminationKmv.queries,
      "LloydIvfPq" -> LloydIvfPq.queries,
      "IndexStore" -> IndexStore.queries,
      "IndexStaleness" -> IndexStaleness.queries,
      "IndexVersions" -> IndexVersions.queries,
      "IndexAlias" -> IndexAlias.queries,
      "IndexCompaction" -> IndexCompaction.queries,
      "ArtifactRetention" -> ArtifactRetention.queries)
    val total = moduleMaps.map(_._2.size).sum
    assert(SparkEntry.queries.size == total,
      s"name collision: merged ${SparkEntry.queries.size} of $total registered; " +
        moduleMaps.flatMap { case (m, q) => q.keys.map(_ -> m) }
          .groupBy(_._1).filter(_._2.size > 1).keys.mkString(", "))
  }

  test("rows-only queries (no oracle) are the documented exceptions") {
    // round-16: x19/x31/x79/x151 re-pointed at the integer-exact
    // trained indexes, so each carries a training-included oracle; the
    // HLL++ state (b11) is the one implementation-defined remainder
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == Set("b11_approx_distinct"),
      s"unexpected oracle-less queries: $noOracle")
  }
}
