package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X185 — inverted-list compaction: the maintenance edge the X180
  * ingest story implies. Between retrains, every streamed arrival
  * APPENDS a file into its inverted list's partition directory
  * (`cell=<k>/part-*`, the X179 v3 layout) — after a day of
  * micro-batches a hot cell holds thousands of tiny files, and probe
  * scan cost shifts from bytes to file opens (the classic small-file
  * problem, here concentrated by the index's own partitioning). The
  * maintenance job rewrites each inverted list into size-targeted
  * files — ONE shuffle keyed by cell, each list written independently
  * (embarrassingly parallel at any cell count) — into a NEW root via
  * the shared write-once atomic-rename protocol ([[ArtifactStore]]),
  * so probes never see a half-compacted artifact and the fragmented
  * root stays intact for rollback (the X184 alias can flip between
  * them).
  *
  * Compaction must be INVISIBLE to the probe — that is its contract,
  * and the registered query certifies it cross-engine: probe the
  * compacted reload of the shipped artifact; oracle = x178's training
  * chain, shared verbatim with x178/x179 (one training chain, three
  * query paths — build, persisted, compacted). The fragmented-by-
  * ingest case the op exists for is pinned in IndexCompactionSpec:
  * arrivals appended (X180's encode), per-cell file counts collapse
  * to the target, per-cell rows preserved, and the grown probe —
  * including the arrival's rank — is bit-equal before and after.
  *
  * The planner half ([[fragmentation]]) is b47's shape against the
  * index layout: per-cell file count + bytes + a needs_compaction
  * verdict — driver-side listing of index METADATA (|cells|
  * directories; at production scale, the object-store listing the
  * maintenance scheduler already holds).
  *
  * Reference scope: no vector search in the reference; engine
  * extension (SURVEY §2.5 — the ANN lifecycle's maintenance edge,
  * following X179 persist / X180 ingest / X184 cutover).
  */
object IndexCompaction {

  /** Version tag of the compacted artifact root under IndexStore's
    * key scheme. */
  val CompactTag = "_c1"

  /** Per-cell fragmentation report over a persisted artifact root:
    * (cell, n_files, n_bytes, needs_compaction). Test/planner seam —
    * file layout is invisible to a SQL oracle, so this is spec-pinned
    * rather than registered. */
  private[graft] def fragmentation(root: String,
      targetFilesPerCell: Int = 1): Seq[(Long, Int, Long, Boolean)] = {
    val enc = new java.io.File(s"$root/encoded")
    val cellDirs = Option(enc.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    cellDirs.map { d =>
      val parts = d.listFiles().filter(f =>
        f.isFile && f.getName.startsWith("part-"))
      (d.getName.stripPrefix("cell=").toLong, parts.length,
        parts.map(_.length()).sum, parts.length > targetFilesPerCell)
    }.sortBy(_._1).toSeq
  }

  /** Rewrite an artifact with each inverted list compacted to one
    * file: one shuffle keyed by cell (each cell lands whole in one
    * task, so partitionBy emits exactly one file per list), parameter
    * tables copied. Probe-invariant by construction — certified by
    * the registered query's shared oracle. */
  private[graft] def writeCompacted(index: LloydIvfPq.IvfPqIndex,
      root: String): Unit = {
    index.encoded.repartition(col("cell")).write.partitionBy("cell")
      .mode("overwrite").parquet(s"$root/encoded")
    index.centroids.write.mode("overwrite").parquet(s"$root/centroids")
    index.codebooks.write.mode("overwrite").parquet(s"$root/codebooks")
  }

  /** Compact an arbitrary source root into `dstRoot`, atomically. */
  private[graft] def compactTo(spark: SparkSession, srcRoot: String,
      dstRoot: String): String =
    ArtifactStore.ensureDirAt(dstRoot)(tmp =>
      writeCompacted(IndexStore.readIvfPq(spark, srcRoot), tmp))

  private val ensured =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]

  private[graft] def ensureCompactedRoot(spark: SparkSession,
      dir: String): String = {
    val perSession = ensured.synchronized {
      ensured.computeIfAbsent(spark,
        _ => scala.collection.concurrent.TrieMap.empty[String, String])
    }
    perSession.getOrElseUpdate(dir,
      compactTo(spark, IndexStore.ensureRoot(spark, dir),
        IndexStore.defaultRoot(dir, CompactTag)))
  }

  /** The registered query: persist (x179's ensure), COMPACT into a new
    * root, reload the compacted artifact, probe. Oracle = x178's
    * training chain, shared with x178/x179 — a hash match proves the
    * compaction rewrite is invisible to the probe. */
  def compactedProbe(spark: SparkSession, dir: String): DataFrame =
    LloydIvfPq.probe(
      IndexStore.readIvfPq(spark, ensureCompactedRoot(spark, dir)))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x185_index_compaction" -> compactedProbe _)

  val oracles: Map[String, String] = Map(
    "x185_index_compaction" -> LloydIvfPq.ivfPqTopKSql)
}
