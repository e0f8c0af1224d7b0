package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X186 — artifact retention sweep: the VACUUM half of the lakehouse
  * maintenance pattern whose OPTIMIZE half is b47/x185. The write-once,
  * content-fingerprint-keyed artifact design ([[ArtifactStore]]) means
  * every source regeneration (new fingerprint), every retrain (x183's
  * `_r1`), and every compaction (x185's `_c1`) leaves its predecessor
  * root on disk forever — correct (immutability is what makes X184's
  * rollback one flip away) but unbounded. The sweep is the retention
  * policy: keep the root the SERVING alias names, keep its group
  * siblings (same source fingerprint — the rollback set one flip can
  * reach), keep anything younger than a safety window (a build another
  * process may be about to alias), delete the rest.
  *
  * Safety invariant — NEVER a root the alias names: the alias set is
  * re-read immediately before each individual delete, so a cutover
  * landing mid-sweep (X184 flips are designed to happen at any moment)
  * rescues its new target even when classification already marked it
  * deletable (pinned in ArtifactRetentionSpec).
  *
  * X187 adds the READER half of the safety story: deletion is
  * two-phase (mark on first observed dereference, reclaim only after
  * [[ReaderGraceMs]]), because the creation-age safety window cannot
  * protect a long-serving root from being reclaimed out from under a
  * reader the instant a flip retires it — see [[ReaderGraceMs]].
  *
  * Cost shape at 100 TB: the sweep is driver-side store METADATA — one
  * directory listing plus one stat per root plus one tiny alias read
  * per root-delete; data files are never opened. That is the
  * object-store listing a production VACUUM job already performs.
  *
  * The registered query is the planner/audit half in b47's established
  * shape: a deterministic store inventory derived from `documents`
  * (each (source, generation) group stands for one artifact root with
  * its real byte mass; the generation key `(doc_id div 7) % 4` is
  * decorrelated from the round-robin doc_id↔source assignment), ranked newest-first per source and classified
  * with the sweep's own verdict ladder — serving (newest), rollback
  * (next), young (inside the safety window), delete. The filesystem
  * half is invisible to a SQL oracle by nature, so it is spec-pinned
  * (the b47/x185 discipline: plan oracle-checked, execution
  * spec-pinned).
  *
  * Parity: counts and byte sums are exact i64 (DuckDB `sum` goes
  * through CAST to BIGINT), ranks are ROW_NUMBER over a per-source
  * total order (gen is unique within source), ages are integer
  * arithmetic.
  *
  * Reference scope: no artifact store in the reference; engine
  * extension (SURVEY §2.5 — the ANN lifecycle's retention edge,
  * round-17 verdict item 2).
  */
object ArtifactRetention {

  /** Safety window for the REAL sweep: a root younger than this is
    * kept even when unreferenced — its writer may be about to alias
    * it. */
  private[graft] val SafetyWindowMs: Long = 24L * 3600L * 1000L

  /** X187 — reader grace for deferred reclamation. The creation-age
    * window above cannot protect a LONG-SERVING root: the moment an
    * X184 flip dereferences a months-old root it is instantly
    * delete-eligible, while a reader that resolved the alias just
    * before the flip may still be mid-probe on it. So unreferenced
    * roots are never deleted on sight: the first sweep that observes a
    * root unreferenced MARKS it (a sidecar `<root>.retired` file with
    * the observation time); only a sweep at least this much later
    * reclaims it — the two-phase mark-then-reclaim of Iceberg snapshot
    * expiry / S3 lifecycle transitions. The deployment bound: grace ≥
    * max reader session length + the alias-resolution staleness of any
    * consumer (one trigger interval for X180's alias-following ingest,
    * per StreamIndexIngest). A re-referenced root (X184 rollback flip)
    * has its marker cleared — the clock restarts from zero if it is
    * ever dereferenced again. `graceMs = 0` degenerates to the
    * single-sweep X186 behavior (valid for quiesced offline stores). */
  private[graft] val ReaderGraceMs: Long = 6L * 3600L * 1000L

  /** Safety window of the derived audit, in its day units — sized so
    * the registered corpus exercises every verdict. */
  private[graft] val AuditWindowDays = 13L

  /** Reader grace of the derived audit, in its day units — sized so
    * the 6-generation inventory exercises marked_pending AND reclaim
    * (ages 0/6/12/18/24/30 → days-out-of-window 0/0/0/5/11/17). */
  private[graft] val AuditGraceDays = 8L

  /** The sweep's report: every root still on disk, the unreferenced
    * ones inside their reader grace (marked, not yet reclaimable), and
    * the reclaimed ones. */
  private[graft] final case class SweepReport(kept: Seq[String],
      pending: Seq[String], deleted: Seq[String])

  // ---------------------------------------------------------- sweep --

  /** Group key of an artifact root name: everything through the
    * 12-hex content fingerprint ("ivfpq_v3_<pathkey>_<fp>"), tags
    * (`_r1`, `_c1`) stripped — the set X184's rollback can reach with
    * one flip. Names without a fingerprint are their own group. */
  private[graft] def groupOf(name: String): String =
    "^(.*_[0-9a-f]{12})((?:_[a-z]\\d+)*)$".r.findFirstMatchIn(name)
      .map(_.group(1)).getOrElse(name)

  /** Basenames of every root a `*.serving` alias in the store names
    * RIGHT NOW — one tiny file read per alias. */
  private[graft] def servingRoots(storeDir: String): Set[String] = {
    val dir = new java.io.File(storeDir)
    Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isFile && f.getName.endsWith(".serving"))
      .map(f => java.nio.file.Paths.get(
        IndexAlias.readAlias(f.toPath).root).getFileName.toString)
      .toSet
  }

  /** Sidecar marker recording when a sweep FIRST observed this root
    * unreferenced — the grace clock X187 reclamation runs on. */
  private[graft] def markerPath(storeDir: String,
      rootName: String): java.nio.file.Path =
    java.nio.file.Paths.get(storeDir, rootName + ".retired")

  private[graft] def readMarker(p: java.nio.file.Path): Option[Long] =
    if (!java.nio.file.Files.exists(p)) None
    else scala.util.Try(
      java.nio.file.Files.readString(p).trim.toLong).toOption

  /** The retention sweep — X186's keep classification with X187's
    * two-phase reclamation. `beforeDelete` is the spec's seam for
    * racing an alias flip against the delete loop. */
  private[graft] def sweep(storeDir: String,
      windowMs: Long = SafetyWindowMs,
      nowMs: Long = System.currentTimeMillis(),
      graceMs: Long = ReaderGraceMs,
      beforeDelete: String => Unit = _ => ()): SweepReport = {
    import java.nio.file.Files
    val dir = new java.io.File(storeDir)
    val all = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
    val roots = all
      .filter(f => f.isDirectory && !f.getName.contains(".tmp-"))
      .sortBy(_.getName).toSeq
    val rootNames = roots.map(_.getName).toSet
    val serving = servingRoots(storeDir)
    val servingGroups = serving.map(groupOf)
    def referenced(name: String, s: Set[String]): Boolean =
      s.contains(name) || s.map(groupOf).contains(groupOf(name))
    val (keep, candidates) = roots.partition { f =>
      referenced(f.getName, serving) ||
        nowMs - f.lastModified() <= windowMs
    }
    // a kept root with a marker was re-referenced (rollback flip) or is
    // young again: clear it — the grace clock restarts from zero on the
    // next dereference, it never inherits a stale observation
    keep.foreach(f => Files.deleteIfExists(markerPath(storeDir, f.getName)))
    // markers whose root is gone (reclaimed by an earlier sweep that
    // died between the two deletes, or a root removed out-of-band)
    all.filter(f => f.isFile && f.getName.endsWith(".retired") &&
        !rootNames.contains(f.getName.stripSuffix(".retired")))
      .foreach(f => Files.deleteIfExists(f.toPath))
    val pending = Seq.newBuilder[String]
    val deleted = Seq.newBuilder[String]
    candidates.foreach { f =>
      val mp = markerPath(storeDir, f.getName)
      // first observation marks; an unparseable (torn) marker re-marks
      val markedAt = readMarker(mp).getOrElse {
        Files.writeString(mp, nowMs.toString); nowMs
      }
      if (nowMs - markedAt < graceMs) pending += f.getName
      else {
        beforeDelete(f.getName)
        // the alias may have flipped since classification: re-read, and
        // never delete a root the alias NOW names (or its group sibling)
        val now = servingRoots(storeDir)
        if (referenced(f.getName, now)) Files.deleteIfExists(mp)
        else {
          org.apache.commons.io.FileUtils.deleteDirectory(f)
          Files.deleteIfExists(mp)
          deleted += f.getName
        }
      }
    }
    val gone = deleted.result()
    SweepReport(roots.map(_.getName).diff(gone), pending.result(), gone)
  }

  // ------------------------------------------------ registered audit --

  /** The audit/planner query: one row per (source, generation) root of
    * the derived inventory — n_files, byte mass, age, verdict. The
    * newest generation per source is the SERVING root, the next is its
    * rollback sibling, younger-than-window roots are kept for safety,
    * the rest are the sweep's reclaim set. */
  def retentionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val roots = Tables.documents(spark, dir)
      .groupBy($"source", expr("(doc_id div 7) % 4").as("gen"))
      .agg(count(lit(1)).as("n_files"),
        sum($"n_chars").as("root_bytes"))
    val bySrc = Window.partitionBy($"source")
    roots
      .withColumn("rnk", row_number().over(bySrc.orderBy($"gen".desc)))
      .withColumn("age_days", (max($"gen").over(bySrc) - $"gen") * 6L)
      .withColumn("verdict",
        when($"rnk" === 1, "keep_serving")
          .when($"rnk" === 2, "keep_rollback")
          .when($"age_days" <= AuditWindowDays, "keep_young")
          .otherwise("delete"))
      .select($"source", $"gen", $"n_files", $"root_bytes", $"age_days",
        $"verdict")
      .orderBy($"source", $"gen".desc)
  }

  val retentionPlanSql: String =
    s"""WITH roots AS (
       |  SELECT source, (doc_id // 7) % 4 AS gen, count(*) AS n_files,
       |         CAST(sum(n_chars) AS BIGINT) AS root_bytes
       |  FROM documents GROUP BY 1, 2
       |), ranked AS (
       |  SELECT source, gen, n_files, root_bytes,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY gen DESC) AS rnk,
       |         (max(gen) OVER (PARTITION BY source) - gen) * 6 AS age_days
       |  FROM roots
       |)
       |SELECT source, gen, n_files, root_bytes, age_days,
       |       CASE WHEN rnk = 1 THEN 'keep_serving'
       |            WHEN rnk = 2 THEN 'keep_rollback'
       |            WHEN age_days <= $AuditWindowDays THEN 'keep_young'
       |            ELSE 'delete' END AS verdict
       |FROM ranked
       |ORDER BY source, gen DESC""".stripMargin

  /** X187 — the graceful-reclamation audit: x186's planner shape with
    * the two-phase verdict ladder. The inventory widens to six
    * generations per source (ages 0/6/12/18/24/30 days) so every
    * verdict is exercised: newest = serving, next = rollback, inside
    * the safety window = young, then `marked_days` — days since the
    * root aged OUT of the safety window, the audit's deterministic
    * stand-in for "days since a sweep first observed it unreferenced"
    * — splits the remainder into marked_pending (inside the reader
    * grace) and reclaim. Same parity discipline as x186: exact i64
    * counts/sums, ROW_NUMBER over a per-source total order, integer
    * day arithmetic. */
  def gracefulRetentionPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val roots = Tables.documents(spark, dir)
      .groupBy($"source", expr("(doc_id div 7) % 6").as("gen"))
      .agg(count(lit(1)).as("n_files"),
        sum($"n_chars").as("root_bytes"))
    val bySrc = Window.partitionBy($"source")
    roots
      .withColumn("rnk", row_number().over(bySrc.orderBy($"gen".desc)))
      .withColumn("age_days", (max($"gen").over(bySrc) - $"gen") * 6L)
      .withColumn("marked_days",
        greatest($"age_days" - lit(AuditWindowDays), lit(0L)))
      .withColumn("verdict",
        when($"rnk" === 1, "keep_serving")
          .when($"rnk" === 2, "keep_rollback")
          .when($"age_days" <= AuditWindowDays, "keep_young")
          .when($"marked_days" <= AuditGraceDays, "marked_pending")
          .otherwise("reclaim"))
      .select($"source", $"gen", $"n_files", $"root_bytes", $"age_days",
        $"marked_days", $"verdict")
      .orderBy($"source", $"gen".desc)
  }

  val gracefulRetentionPlanSql: String =
    s"""WITH roots AS (
       |  SELECT source, (doc_id // 7) % 6 AS gen, count(*) AS n_files,
       |         CAST(sum(n_chars) AS BIGINT) AS root_bytes
       |  FROM documents GROUP BY 1, 2
       |), ranked AS (
       |  SELECT source, gen, n_files, root_bytes,
       |         row_number() OVER (PARTITION BY source
       |                            ORDER BY gen DESC) AS rnk,
       |         (max(gen) OVER (PARTITION BY source) - gen) * 6 AS age_days
       |  FROM roots
       |)
       |SELECT source, gen, n_files, root_bytes, age_days,
       |       GREATEST(age_days - $AuditWindowDays, 0) AS marked_days,
       |       CASE WHEN rnk = 1 THEN 'keep_serving'
       |            WHEN rnk = 2 THEN 'keep_rollback'
       |            WHEN age_days <= $AuditWindowDays THEN 'keep_young'
       |            WHEN GREATEST(age_days - $AuditWindowDays, 0)
       |                 <= $AuditGraceDays THEN 'marked_pending'
       |            ELSE 'reclaim' END AS verdict
       |FROM ranked
       |ORDER BY source, gen DESC""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x186_artifact_retention" -> retentionPlan _,
    "x187_graceful_retention" -> gracefulRetentionPlan _)

  val oracles: Map[String, String] = Map(
    "x186_artifact_retention" -> retentionPlanSql,
    "x187_graceful_retention" -> gracefulRetentionPlanSql)
}
