package graft

import java.nio.file.{Files, Paths}

import graft.ops.{ArtifactRetention, IndexAlias}

/** X186 — artifact retention sweep (round-17 verdict item 2): the
  * serving root and its rollback group survive every sweep, young roots
  * survive, stale unreferenced groups are reclaimed, and an alias
  * flipped MID-SWEEP onto a doomed root rescues it.
  */
class ArtifactRetentionSpec extends SparkSpec {

  import spark.implicits._

  private val FpA = "a" * 12
  private val FpB = "b" * 12
  private val Key = "0" * 32

  private def plantRoot(store: String, name: String,
      ageMs: Long = 0L): java.nio.file.Path = {
    val p = Paths.get(store, name)
    Files.createDirectories(p)
    Files.writeString(p.resolve("payload"), name)
    if (ageMs > 0)
      assert(p.toFile.setLastModified(System.currentTimeMillis() - ageMs))
    p
  }

  private def freshStore(): String = {
    val s = "target/artifact_retention_spec/store_" +
      java.util.UUID.randomUUID().toString.take(8)
    Files.createDirectories(Paths.get(s))
    s
  }

  private val Old = 3L * ArtifactRetention.SafetyWindowMs

  test("X186: the sweep keeps the serving root, its rollback group " +
    "siblings, and young roots; stale unreferenced groups are deleted") {
    val store = freshStore()
    // serving group (fingerprint A): untagged v1 + the retrained _r1
    // the alias names — BOTH old enough to be age-deletable
    val v1 = plantRoot(store, s"ivfpq_v3_${Key}_$FpA", Old)
    val r1 = plantRoot(store, s"ivfpq_v3_${Key}_${FpA}_r1", Old)
    // a superseded fingerprint group (B): old, unreferenced — reclaim
    val staleB = plantRoot(store, s"ivfpq_v3_${Key}_$FpB", Old)
    val staleBc = plantRoot(store, s"ivfpq_v3_${Key}_${FpB}_c1", Old)
    // a young unreferenced root: another process may be about to alias
    val young = plantRoot(store, s"ivfpq_v3_${Key}_cccccccccccc")
    // a .tmp-* sibling: the janitor's domain, not the sweep's
    val tmp = plantRoot(store, s"ivfpq_v3_${Key}_$FpB.tmp-x", Old)
    IndexAlias.writeAlias(Paths.get(store, "probe.serving"),
      IndexAlias.Serving("v2", r1.toString))

    val (kept, deleted) = ArtifactRetention.sweep(store)
    assert(deleted.toSet == Set(staleB.getFileName.toString,
      staleBc.getFileName.toString),
      s"exactly the stale unreferenced group must go, got $deleted")
    assert(Files.exists(v1),
      "the serving group's untagged sibling is the rollback set — " +
        "one X184 flip away, never swept")
    assert(Files.exists(r1), "the alias target must survive every sweep")
    assert(Files.exists(young), "young roots are kept for safety")
    assert(Files.exists(tmp), "temp dirs belong to the orphan janitor")
    assert(kept.toSet.contains(r1.getFileName.toString))
  }

  test("X186: an alias flipped MID-SWEEP onto a doomed root rescues " +
    "it — the sweep re-reads the alias before every delete") {
    val store = freshStore()
    val r1 = plantRoot(store, s"ivfpq_v3_${Key}_$FpA", Old)
    val doomedB = plantRoot(store, s"ivfpq_v3_${Key}_$FpB", Old)
    val aliasP = Paths.get(store, "probe.serving")
    IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v1", r1.toString))
    // classification marks B deletable; the flip lands between
    // classification and B's delete — exactly X184's any-moment cutover
    val (_, deleted) = ArtifactRetention.sweep(store,
      beforeDelete = name =>
        if (name == doomedB.getFileName.toString)
          IndexAlias.writeAlias(aliasP,
            IndexAlias.Serving("v2", doomedB.toString)))
    assert(deleted.isEmpty,
      s"a flipped-mid-sweep alias target must never be orphaned, " +
        s"deleted=$deleted")
    assert(Files.exists(doomedB))
  }

  test("X186: group keys strip version tags and fall back to the full " +
    "name when no fingerprint is present") {
    assert(ArtifactRetention.groupOf(s"ivfpq_v3_${Key}_$FpA") ==
      s"ivfpq_v3_${Key}_$FpA")
    assert(ArtifactRetention.groupOf(s"ivfpq_v3_${Key}_${FpA}_r1") ==
      s"ivfpq_v3_${Key}_$FpA")
    assert(ArtifactRetention.groupOf(s"ivfpq_v3_${Key}_${FpA}_c1") ==
      s"ivfpq_v3_${Key}_$FpA")
    assert(ArtifactRetention.groupOf("some_legacy_root") ==
      "some_legacy_root")
  }

  test("X186: the registered audit exercises every verdict and keeps " +
    "exactly one serving and one rollback root per source") {
    val plan = SparkEntry.queries("x186_artifact_retention")(spark, sfDir)
      .collect()
    val verdicts = plan.map(_.getAs[String]("verdict")).toSet
    assert(verdicts == Set("keep_serving", "keep_rollback", "keep_young",
      "delete"), s"the derived inventory must exercise the full ladder, " +
      s"got $verdicts")
    plan.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      assert(rows.count(_.getAs[String]("verdict") == "keep_serving") == 1,
        s"$src: exactly one serving root")
      assert(rows.count(_.getAs[String]("verdict") == "keep_rollback") == 1,
        s"$src: exactly one rollback root")
      // the serving root is the newest generation
      val newest = rows.maxBy(_.getAs[Long]("gen"))
      assert(newest.getAs[String]("verdict") == "keep_serving")
      assert(newest.getAs[Long]("age_days") == 0L)
    }
  }
}
