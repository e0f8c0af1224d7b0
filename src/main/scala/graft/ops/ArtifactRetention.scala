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

  /** Safety window of the derived audit, in its day units — sized so
    * the registered corpus exercises every verdict. */
  private[graft] val AuditWindowDays = 13L

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

  /** The retention sweep. Returns (kept, deleted) root basenames.
    * `beforeDelete` is the spec's seam for racing an alias flip against
    * the delete loop. */
  private[graft] def sweep(storeDir: String,
      windowMs: Long = SafetyWindowMs,
      nowMs: Long = System.currentTimeMillis(),
      beforeDelete: String => Unit = _ => ()): (Seq[String], Seq[String]) = {
    val dir = new java.io.File(storeDir)
    val roots = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && !f.getName.contains(".tmp-"))
      .sortBy(_.getName).toSeq
    val serving = servingRoots(storeDir)
    val servingGroups = serving.map(groupOf)
    val (keep, candidates) = roots.partition { f =>
      serving.contains(f.getName) ||
        servingGroups.contains(groupOf(f.getName)) ||
        nowMs - f.lastModified() <= windowMs
    }
    val deleted = candidates.flatMap { f =>
      beforeDelete(f.getName)
      // the alias may have flipped since classification: re-read, and
      // never delete a root the alias NOW names (or its group sibling)
      val now = servingRoots(storeDir)
      if (now.contains(f.getName) ||
          now.map(groupOf).contains(groupOf(f.getName))) None
      else {
        org.apache.commons.io.FileUtils.deleteDirectory(f)
        Some(f.getName)
      }
    }
    (roots.map(_.getName).diff(deleted), deleted)
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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x186_artifact_retention" -> retentionPlan _)

  val oracles: Map[String, String] = Map(
    "x186_artifact_retention" -> retentionPlanSql)
}
