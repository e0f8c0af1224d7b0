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

    val report = ArtifactRetention.sweep(store, graceMs = 0L)
    val (kept, deleted) = (report.kept, report.deleted)
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
    val deleted = ArtifactRetention.sweep(store, graceMs = 0L,
      beforeDelete = name =>
        if (name == doomedB.getFileName.toString)
          IndexAlias.writeAlias(aliasP,
            IndexAlias.Serving("v2", doomedB.toString))).deleted
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

  // ------------------------------------------------------------ X187 --

  private val Grace = ArtifactRetention.ReaderGraceMs

  test("X187: a long-serving root dereferenced by a flip is NEVER " +
    "reclaimed on sight — marked on first observation, pending through " +
    "the reader grace, reclaimed only after it") {
    val store = freshStore()
    val t0 = System.currentTimeMillis()
    // months old — the creation-age window is long expired, so under
    // the pre-X187 rule this root would die in the very first sweep
    val retired = plantRoot(store, s"ivfpq_v3_${Key}_$FpB", Old)
    val servingR = plantRoot(store, s"ivfpq_v3_${Key}_$FpA", Old)
    IndexAlias.writeAlias(Paths.get(store, "probe.serving"),
      IndexAlias.Serving("v2", servingR.toString))
    val marker = ArtifactRetention.markerPath(
      store, retired.getFileName.toString)

    val s1 = ArtifactRetention.sweep(store, nowMs = t0)
    assert(s1.deleted.isEmpty && s1.pending ==
      Seq(retired.getFileName.toString),
      "first observation marks, never deletes — a reader that resolved " +
        "the alias just before the flip may still be mid-probe")
    assert(ArtifactRetention.readMarker(marker).contains(t0))

    val s2 = ArtifactRetention.sweep(store, nowMs = t0 + Grace - 1)
    assert(s2.deleted.isEmpty && s2.pending.nonEmpty && Files.exists(retired),
      "inside the reader grace the marked root must survive")
    assert(ArtifactRetention.readMarker(marker).contains(t0),
      "a later sweep must not re-stamp the marker — the clock runs " +
        "from the FIRST observation")

    val s3 = ArtifactRetention.sweep(store, nowMs = t0 + Grace)
    assert(s3.deleted == Seq(retired.getFileName.toString) &&
      !Files.exists(retired) && !Files.exists(marker),
      "past the grace the root and its marker are reclaimed together")
    assert(Files.exists(servingR))
  }

  test("X187: a rollback flip onto a marked root clears its marker — " +
    "the grace clock restarts from zero on the next dereference") {
    val store = freshStore()
    val t0 = System.currentTimeMillis()
    val a = plantRoot(store, s"ivfpq_v3_${Key}_$FpA", Old)
    val b = plantRoot(store, s"ivfpq_v3_${Key}_$FpB", Old)
    val aliasP = Paths.get(store, "probe.serving")
    IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v2", a.toString))
    val markerB = ArtifactRetention.markerPath(store, b.getFileName.toString)

    assert(ArtifactRetention.sweep(store, nowMs = t0).pending ==
      Seq(b.getFileName.toString))
    // rollback onto B: it is serving again — the mark must not linger
    IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v1", b.toString))
    val s2 = ArtifactRetention.sweep(store, nowMs = t0 + 2 * Grace)
    assert(s2.deleted.isEmpty && !Files.exists(markerB),
      "a re-referenced root sheds its marker")
    // flip away again much later: B must get a FRESH observation, not
    // inherit t0 — else a brief rollback window would strand readers
    IndexAlias.writeAlias(aliasP, IndexAlias.Serving("v2", a.toString))
    val s3 = ArtifactRetention.sweep(store, nowMs = t0 + 3 * Grace)
    assert(s3.deleted.isEmpty && s3.pending == Seq(b.getFileName.toString),
      "the second dereference starts a new grace period")
    assert(ArtifactRetention.readMarker(markerB).contains(t0 + 3 * Grace))
    assert(ArtifactRetention.sweep(store,
      nowMs = t0 + 4 * Grace).deleted == Seq(b.getFileName.toString))
  }

  test("X187: orphan markers (root already gone) are cleaned; a torn " +
    "marker re-marks instead of crashing or deleting early") {
    val store = freshStore()
    val t0 = System.currentTimeMillis()
    val a = plantRoot(store, s"ivfpq_v3_${Key}_$FpA", Old)
    IndexAlias.writeAlias(Paths.get(store, "probe.serving"),
      IndexAlias.Serving("v1", a.toString))
    val orphan = ArtifactRetention.markerPath(store, "long_gone_root")
    Files.writeString(orphan, "12345")
    val b = plantRoot(store, s"ivfpq_v3_${Key}_$FpB", Old)
    val markerB = ArtifactRetention.markerPath(store, b.getFileName.toString)
    Files.writeString(markerB, "not-a-timestamp")
    val s1 = ArtifactRetention.sweep(store, nowMs = t0)
    assert(!Files.exists(orphan), "markers without a root are swept")
    assert(s1.pending == Seq(b.getFileName.toString) && Files.exists(b),
      "an unparseable marker is re-stamped, never treated as expired")
    assert(ArtifactRetention.readMarker(markerB).contains(t0))
  }

  test("X187: the registered graceful audit exercises the full " +
    "five-verdict ladder with exact per-source counts") {
    val plan = SparkEntry.queries("x187_graceful_retention")(spark, sfDir)
      .collect()
    assert(plan.map(_.getAs[String]("verdict")).toSet ==
      Set("keep_serving", "keep_rollback", "keep_young",
        "marked_pending", "reclaim"))
    plan.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val byVerdict = rows.groupBy(_.getAs[String]("verdict"))
        .view.mapValues(_.length).toMap
      assert(byVerdict == Map("keep_serving" -> 1, "keep_rollback" -> 1,
        "keep_young" -> 1, "marked_pending" -> 1, "reclaim" -> 2),
        s"$src: six generations must land 1/1/1/1/2 on the ladder, " +
          s"got $byVerdict")
      // marked_days is 0 everywhere inside the window and counts days
      // out-of-window beyond it — the audit's stand-in for the marker
      rows.foreach { r =>
        val expect = math.max(
          r.getAs[Long]("age_days") - ArtifactRetention.AuditWindowDays, 0L)
        assert(r.getAs[Long]("marked_days") == expect)
      }
    }
  }
}
