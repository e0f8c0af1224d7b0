package graft

import org.apache.spark.sql.functions._

import graft.ops.{IndexCompaction, IndexStore, LloydIvfPq}

/** X185 — inverted-list compaction: probe-invariant (the registered
  * query shares x178's oracle), collapses an ingest-fragmented
  * artifact to one file per list with per-cell rows preserved, and the
  * grown probe — including an appended arrival's rank — is bit-equal
  * before and after.
  */
class IndexCompactionSpec extends SparkSpec {

  import spark.implicits._

  test("X185: registered query equals the in-session x178 probe; the " +
    "oracle is shared by declared design (one chain, three paths)") {
    val reg = SparkEntry.queries("x185_index_compaction")(spark, sfDir)
    val x178 = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
    assert(reg.collect().map(_.toString).toSeq ==
      x178.collect().map(_.toString).toSeq,
      "compaction must be invisible to the probe")
    assert(SparkEntry.oracleSql("x185_index_compaction") ==
      SparkEntry.oracleSql("x178_ivfpq_topk"))
    assert(SparkEntry.oracleSql("x185_index_compaction") ==
      SparkEntry.oracleSql("x179_ivfpq_persisted_topk"))
  }

  test("X185: an ingest-fragmented artifact compacts to one file per " +
    "inverted list, rows preserved per cell, grown probe bit-equal") {
    import graft.stream.StreamIndexIngest
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val root = "target/index_compaction_spec/fragmented"
    IndexStore.writeIvfPq(built, root)
    // three micro-batch-style appends: one near-duplicate of query 0
    // (must survive compaction AT ITS RANK) plus two filler arrivals —
    // every append adds a file to its inverted list's directory
    val q0 = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" === 0L).select($"embedding")
      .collect().head.getSeq[Float](0).toArray
    val centRow = StreamIndexIngest.centroidRow(built.centroids)
    val cbRow = StreamIndexIngest.codebookFlatRow(built.codebooks)
    Seq(0, 1, 2).foreach { i =>
      val nv = q0.clone(); nv(0) = nv(0) + (i + 1) * 1e-4f
      StreamIndexIngest.encodeArrivals(
        Seq((888880L + i, nv)).toDF("vec_id", "embedding"),
        centRow, cbRow)
        .write.partitionBy("cell").mode("append").parquet(s"$root/encoded")
    }
    val frag = IndexCompaction.fragmentation(root)
    assert(frag.exists(_._2 > 1),
      s"appends must fragment at least one inverted list, got $frag")
    // per-cell row counts before compaction
    val before = IndexStore.readIvfPq(spark, root)
    val rowsBefore = before.encoded.groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeBefore = LloydIvfPq.probe(before)
      .collect().map(_.toString).toSeq

    val croot = IndexCompaction.compactTo(spark, root,
      "target/index_compaction_spec/compacted")
    val cfrag = IndexCompaction.fragmentation(croot)
    assert(cfrag.nonEmpty && cfrag.forall(_._2 == 1),
      s"every inverted list must compact to one file, got $cfrag")
    assert(cfrag.forall(!_._4), "nothing left to compact")
    val after = IndexStore.readIvfPq(spark, croot)
    val rowsAfter = after.encoded.groupBy($"cell").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rowsAfter == rowsBefore,
      "compaction must move every row and invent none")
    val probeAfter = LloydIvfPq.probe(after)
      .collect().map(_.toString).toSeq
    assert(probeAfter == probeBefore,
      "the grown probe (arrival included) must be bit-equal")
    assert(probeAfter.exists(_.contains("888880")),
      "the appended near-duplicate must still be served after compaction")
    // the atomic ensure left no temp directory behind
    val parent = java.nio.file.Paths.get(croot).getParent
    val leftovers = java.nio.file.Files.list(parent).iterator()
    while (leftovers.hasNext) {
      val f = leftovers.next().getFileName.toString
      assert(!f.contains(".tmp-"), s"compaction leaked a temp dir: $f")
    }
  }

  test("X185: arrivals landing DURING compaction and DURING the alias " +
    "flip survive the sequenced handoff — reconcile catches the " +
    "mid-compaction appends, the post-flip sweep catches the flip " +
    "racer, and the served probe is bit-equal to the grown live root") {
    import graft.stream.StreamIndexIngest
    import graft.ops.IndexAlias
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    // UUID-unique: compactAndCutover requires a fresh write-once dst
    val base = "target/index_compaction_spec/handoff_" +
      java.util.UUID.randomUUID().toString.take(8)
    val live = s"$base/live"
    IndexStore.writeIvfPq(built, live)
    val centRow = StreamIndexIngest.centroidRow(built.centroids)
    val cbRow = StreamIndexIngest.codebookFlatRow(built.codebooks)
    val q0 = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" === 0L).select($"embedding")
      .collect().head.getSeq[Float](0).toArray
    // X180's ingest path verbatim: encode against the frozen tables,
    // append a file into the arrival's inverted-list directory. Near-
    // duplicates of query 0 so every arrival MUST rank in the probe —
    // a lost arrival is a wrong answer, not a silent row-count drift.
    def appendArrival(id: Long, eps: Float): Unit = {
      val nv = q0.clone(); nv(0) = nv(0) + eps
      StreamIndexIngest.encodeArrivals(
        Seq((id, nv)).toDF("vec_id", "embedding"), centRow, cbRow)
        .write.partitionBy("cell").mode("append").parquet(s"$live/encoded")
    }
    val aliasP = java.nio.file.Paths.get(s"$base/serving.alias")
    val h = IndexCompaction.compactAndCutover(spark, aliasP, "v1",
      live, s"$base/compacted",
      // two arrivals land between the snapshot read and the reconcile
      afterSnapshot = () => {
        appendArrival(777770L, 1e-4f); appendArrival(777771L, 2e-4f)
      },
      // one more lands AFTER the alias flip — the racing writer that
      // resolved the alias before the flip and appended after it
      afterFlip = () => appendArrival(777772L, 3e-4f))
    assert(h.reconciled >= 2,
      s"the reconcile loop must catch the mid-compaction appends, got $h")
    assert(h.stragglers >= 1,
      s"the post-flip sweep must catch the flip racer, got $h")
    val serving = IndexAlias.readAlias(aliasP)
    assert(serving.root == h.root && serving.version == "v1")
    // the handoff's whole contract: probing THROUGH the alias after the
    // flip is bit-equal to probing the live root grown with the same
    // arrivals — nothing lost, nothing duplicated, ranks included
    val servedProbe = LloydIvfPq.probe(
      IndexStore.readIvfPq(spark, serving.root))
      .collect().map(_.toString).toSeq
    val liveProbe = LloydIvfPq.probe(IndexStore.readIvfPq(spark, live))
      .collect().map(_.toString).toSeq
    assert(servedProbe == liveProbe,
      "post-flip probe must be bit-equal to the grown live root")
    Seq("777770", "777771", "777772").foreach(id =>
      assert(servedProbe.exists(_.contains(id)),
        s"arrival $id missing from the served probe — the lost-arrival " +
          "seam the handoff exists to close"))
    // per-cell rows: the served root holds exactly the live rows
    def counts(root: String): Map[Long, Long] =
      IndexStore.readIvfPq(spark, root).encoded.groupBy($"cell").count()
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(serving.root) == counts(live),
      "served per-cell counts must equal the live root's")
  }

  test("X185: the fragmentation planner reports exactly the on-disk " +
    "layout") {
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val root = "target/index_compaction_spec/planner"
    IndexStore.writeIvfPq(built, root)
    val frag = IndexCompaction.fragmentation(root)
    val cells = built.encoded.select($"cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(frag.map(_._1).toSet == cells,
      "one report row per inverted list")
    frag.foreach { case (cell, nFiles, nBytes, needs) =>
      val d = new java.io.File(s"$root/encoded/cell=$cell")
      val parts = d.listFiles().filter(f =>
        f.isFile && f.getName.startsWith("part-"))
      assert(parts.length == nFiles && parts.map(_.length()).sum == nBytes,
        s"cell $cell report must match the filesystem")
      assert(needs == (nFiles > 1))
    }
  }
}
