package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one named query
  * here; `oracleSql` carries the DuckDB-equivalent SQL for the driver's
  * hash-compare. Column names and row order are made to match exactly on
  * both sides (stable ORDER BY, aliased aggregates, decimal-exact sums —
  * see graft.functions.OracleSafe).
  */
object SparkEntry {

  /** Flagship query; driver smoke-checks rows>0. Defaults to the sf0.001
    * testdata but re-points via SPARK_GRAFT_ENTRY_DIR. */
  def entry(spark: SparkSession): DataFrame =
    Events.windowAgg(spark,
      sys.env.getOrElse("SPARK_GRAFT_ENTRY_DIR", "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    List[Map[String, (SparkSession, String) => DataFrame]](
      Relational.queries, Events.queries, Text.queries, Vector.queries,
      Dedup.queries, Weather.queries, Multimodal.queries, AsOf.queries,
      Curation.queries, Decontam.queries, Profile.queries, Packing.queries,
      Repetition.queries, Mixing.queries, Scrub.queries,
      SimHashDedup.queries, Chunking.queries, Layout.queries,
      Centroids.queries, Funnel.queries, EpochShuffle.queries,
      InvertedIndex.queries, Cooccur.queries, Sketch.queries,
      Quantize.queries, LmScore.queries, Vocab.queries, Intervals.queries,
      Fuzzy.queries, Normalize.queries, Divergence.queries,
      SpanDedup.queries, Winsorize.queries, Resample.queries,
      Rolling.queries, IncrementalDedup.queries, CdcChunking.queries,
      Tokenizer.queries, RepeatSuppress.queries, Integrity.queries,
      CrossSource.queries, Basket.queries, SplitLeakage.queries,
      Compaction.queries, PrefixJoin.queries, Containment.queries,
      EmbedProfile.queries, Calibration.queries, Attribution.queries,
      SkewAudit.queries, SplitRepair.queries, QualityDedup.queries,
      Bm25.queries, Hybrid.queries, Assign.queries, Twa.queries,
      Cascade.queries, Mode.queries, Correlate.queries, SnapshotDiff.queries,
      IncrementalCc.queries, Batching.queries, Novelty.queries,
      Triangles.queries, ClusterShard.queries, PageRank.queries,
      PitJoin.queries, ThresholdSweep.queries, IncrementalAgg.queries,
      QuantileNorm.queries, Decay.queries, BloomPrune.queries,
      Manifest.queries, GroupedTopK.queries, BitSim.queries,
      SeqAssembly.queries, Cusum.queries, KCore.queries, Trend.queries,
      PpsSample.queries, Surprisal.queries, LabelProp.queries,
      IncScd2.queries, RecallAudit.queries, Matryoshka.queries,
      LinkPredict.queries, Keywords.queries, SortedNeighborhood.queries,
      Auc.queries, Richness.queries, Rendezvous.queries, Gini.queries,
      Bpe.queries, Concentration.queries, Covariance.queries,
      FeatureHash.queries, Contingency.queries, Spearman.queries,
      KsDrift.queries, EditDistance.queries, PowerIteration.queries,
      RandIndex.queries, Mmr.queries, Assortativity.queries,
      Dispersion.queries, Winnowing.queries, InterArrival.queries,
      PathMining.queries, Holdout.queries, RobustRange.queries,
      Distinctive.queries, Wilson.queries, PackSweep.queries,
      LaggedXcorr.queries, Kmv.queries, QuantileSketch.queries,
      AmsF2.queries, ThetaOverlap.queries, SketchRollup.queries,
      KmvAgg.queries, Hll.queries, Wasserstein.queries,
      Importance.queries, SampleAgg.queries, SemDedup.queries,
      DedupRecall.queries, JlProjection.queries, SketchNovelty.queries,
      Expectations.queries, CurationMix.queries, Zipf.queries,
      Benford.queries, Outlier.queries, Boilerplate.queries,
      Heaps.queries, JoinSize.queries, CentroidDrift.queries,
      Psi.queries, Entropy.queries, FdAudit.queries,
      LloydIvf.queries, RankDrift.queries, MannKendall.queries,
      ContaminationMatrix.queries, LloydPq.queries,
      ContaminationKmv.queries, LloydIvfPq.queries, IndexStore.queries,
      IndexStaleness.queries, IndexVersions.queries, IndexAlias.queries,
      IndexCompaction.queries, ArtifactRetention.queries
    ).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    List[Map[String, String]](
      Relational.oracles, Events.oracles, Text.oracles, Vector.oracles,
      Dedup.oracles, Weather.oracles, Multimodal.oracles, AsOf.oracles,
      Curation.oracles, Decontam.oracles, Profile.oracles, Packing.oracles,
      Repetition.oracles, Mixing.oracles, Scrub.oracles,
      SimHashDedup.oracles, Chunking.oracles, Layout.oracles,
      Centroids.oracles, Funnel.oracles, EpochShuffle.oracles,
      InvertedIndex.oracles, Cooccur.oracles, Sketch.oracles,
      Quantize.oracles, LmScore.oracles, Vocab.oracles, Intervals.oracles,
      Fuzzy.oracles, Normalize.oracles, Divergence.oracles,
      SpanDedup.oracles, Winsorize.oracles, Resample.oracles,
      Rolling.oracles, IncrementalDedup.oracles, CdcChunking.oracles,
      Tokenizer.oracles, RepeatSuppress.oracles, Integrity.oracles,
      CrossSource.oracles, Basket.oracles, SplitLeakage.oracles,
      Compaction.oracles, PrefixJoin.oracles, Containment.oracles,
      EmbedProfile.oracles, Calibration.oracles, Attribution.oracles,
      SkewAudit.oracles, SplitRepair.oracles, QualityDedup.oracles,
      Bm25.oracles, Hybrid.oracles, Assign.oracles, Twa.oracles,
      Cascade.oracles, Mode.oracles, Correlate.oracles, SnapshotDiff.oracles,
      IncrementalCc.oracles, Batching.oracles, Novelty.oracles,
      Triangles.oracles, ClusterShard.oracles, PageRank.oracles,
      PitJoin.oracles, ThresholdSweep.oracles, IncrementalAgg.oracles,
      QuantileNorm.oracles, Decay.oracles, BloomPrune.oracles,
      Manifest.oracles, GroupedTopK.oracles, BitSim.oracles,
      SeqAssembly.oracles, Cusum.oracles, KCore.oracles, Trend.oracles,
      PpsSample.oracles, Surprisal.oracles, LabelProp.oracles,
      IncScd2.oracles, RecallAudit.oracles, Matryoshka.oracles,
      LinkPredict.oracles, Keywords.oracles, SortedNeighborhood.oracles,
      Auc.oracles, Richness.oracles, Rendezvous.oracles, Gini.oracles,
      Bpe.oracles, Concentration.oracles, Covariance.oracles,
      FeatureHash.oracles, Contingency.oracles, Spearman.oracles,
      KsDrift.oracles, EditDistance.oracles, PowerIteration.oracles,
      RandIndex.oracles, Mmr.oracles, Assortativity.oracles,
      Dispersion.oracles, Winnowing.oracles, InterArrival.oracles,
      PathMining.oracles, Holdout.oracles, RobustRange.oracles,
      Distinctive.oracles, Wilson.oracles, PackSweep.oracles,
      LaggedXcorr.oracles, Kmv.oracles, QuantileSketch.oracles,
      AmsF2.oracles, ThetaOverlap.oracles, SketchRollup.oracles,
      KmvAgg.oracles, Hll.oracles, Wasserstein.oracles,
      Importance.oracles, SampleAgg.oracles, SemDedup.oracles,
      DedupRecall.oracles, JlProjection.oracles, SketchNovelty.oracles,
      Expectations.oracles, CurationMix.oracles, Zipf.oracles,
      Benford.oracles, Outlier.oracles, Boilerplate.oracles,
      Heaps.oracles, JoinSize.oracles, CentroidDrift.oracles,
      Psi.oracles, Entropy.oracles, FdAudit.oracles,
      LloydIvf.oracles, RankDrift.oracles, MannKendall.oracles,
      ContaminationMatrix.oracles, LloydPq.oracles,
      ContaminationKmv.oracles, LloydIvfPq.oracles, IndexStore.oracles,
      IndexStaleness.oracles, IndexVersions.oracles, IndexAlias.oracles,
      IndexCompaction.oracles, ArtifactRetention.oracles
    ).reduce(_ ++ _)
}
