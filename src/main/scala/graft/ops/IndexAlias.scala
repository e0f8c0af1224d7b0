package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X184 — serving-alias atomic cutover: the index lifecycle's last
  * edge. x182's audit says WHEN to retrain, x183 builds v2 next to v1
  * and emits the comparison view; this operator performs the step a
  * production operator executes after reading that view — flip a tiny
  * SERVING alias to the new version, atomically, with rollback kept
  * one flip away because the old version's artifact is never touched.
  *
  * The alias is a single small FILE next to the v1 artifact root
  * (`<v1 root>.serving`) naming the serving version and its artifact
  * root. Writes go through the same temp + atomic-rename discipline as
  * the artifact roots themselves ([[IndexStore.ensureAt]]), with
  * REPLACE_EXISTING because a swap must overwrite: POSIX rename(2) is
  * atomic, so a concurrent reader observes exactly the old or the new
  * alias, never a torn one (IndexAliasSpec hammers a reader thread
  * against a swapping writer and asserts every read parses to one of
  * the two complete payloads). This is the public production pattern —
  * Iceberg's version-hint file, Hive's symlink flip: the pointer is
  * tiny and atomic precisely because the artifacts are immutable.
  *
  * The registered query runs the WHOLE cutover the way an operator
  * would: audit the registered drift batch against the shipped v1
  * artifact (x182's chain), decide — any alarming cell means the
  * frozen encoder no longer fits the arrivals — and if so ensure the
  * retrained v2 artifact (x183's build) is persisted, flip the alias,
  * then probe THROUGH the alias read back from disk. The decision is a
  * deterministic function of the data, so the DuckDB oracle recomputes
  * it (the x182 ratio chain collapsed to one boolean) and selects the
  * matching probe chain — x178's for v1, x183's retrain chain for v2 —
  * inside one SQL statement; the hash certifies decision + cutover +
  * serve end to end at 1× and 10×.
  *
  * Plan shape at 100 TB: the audit is x182's two map-only encode
  * passes + one ≤|cells| aggregate; the decision is a ≤|cells|-row
  * driver-side existence check (index METADATA, the same class as
  * x179's probed-cell collect); the alias write is one tiny file; the
  * probe is the standard broadcast-lut ADC scan over whichever
  * artifact the alias names. Nothing here scales with the corpus
  * except the passes that already had their scale arguments.
  *
  * Reference scope: no vector search in the reference; engine
  * extension (SURVEY §2.5 — the ANN lifecycle's serving edge, round-16
  * verdict item 1).
  */
object IndexAlias {

  /** Version tag of the retrained artifact root under IndexStore's
    * key scheme ([[IndexStore.defaultRoot]]). */
  val RetrainTag = "_r1"

  final case class Serving(version: String, root: String)

  private[graft] def aliasPath(dir: String): java.nio.file.Path =
    java.nio.file.Paths.get(IndexStore.defaultRoot(dir) + ".serving")

  /** Atomic alias flip: write the payload to a temp sibling, then
    * rename over the alias file (ATOMIC_MOVE + REPLACE_EXISTING — a
    * plain rename(2) on Linux). A reader never sees a partial file:
    * it reads the old inode or the new one. */
  private[graft] def writeAlias(path: java.nio.file.Path,
      s: Serving): Unit = {
    require(s.version == "v1" || s.version == "v2",
      s"unknown index version ${s.version}")
    java.nio.file.Files.createDirectories(path.getParent)
    val tmp = path.resolveSibling(
      path.getFileName.toString + ".tmp-" + java.util.UUID.randomUUID())
    java.nio.file.Files.writeString(tmp,
      s"version=${s.version}\nroot=${s.root}\n")
    java.nio.file.Files.move(tmp, path,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Read the alias; fails loudly on a missing or malformed file —
    * the spec's concurrency hammer proves the atomic flip never
    * produces the malformed case. */
  private[graft] def readAlias(path: java.nio.file.Path): Serving = {
    val kv = java.nio.file.Files.readString(path)
      .split("\n").iterator.filter(_.contains("="))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
    val v = kv.getOrElse("version",
      sys.error(s"malformed serving alias at $path"))
    val r = kv.getOrElse("root",
      sys.error(s"malformed serving alias at $path"))
    require(v == "v1" || v == "v2", s"malformed serving alias at $path")
    Serving(v, r)
  }

  /** The retrain decision against an arrival frame: swap iff any cell
    * alarms in x182's audit. Driver-side existence check over a
    * ≤|cells|-row frame — index metadata, bounded by construction. */
  private[graft] def decideSwap(spark: SparkSession, dir: String,
      arrivals: DataFrame): Boolean = {
    import spark.implicits._
    !IndexStaleness.auditOf(spark, dir, arrivals)
      .filter($"alarm").isEmpty
  }

  /** Ensure the retrained v2 artifact is persisted (build-once, atomic
    * rename — the same protocol as the v1 root). */
  private[graft] def ensureV2Root(spark: SparkSession, dir: String): String =
    IndexStore.ensureRootOf(spark, dir, RetrainTag,
      () => IndexVersions.retrainedIndex(spark, dir))

  /** Roll the alias back to the shipped v1 artifact — the "keep
    * rollback" half of the cutover: v1's artifact was never touched,
    * so one atomic flip restores it bit-for-bit (pinned in
    * IndexAliasSpec). */
  private[graft] def rollback(spark: SparkSession, dir: String): Unit =
    writeAlias(aliasPath(dir),
      Serving("v1", IndexStore.ensureRoot(spark, dir)))

  /** Probe whatever the on-disk alias names RIGHT NOW — the serving
    * path: reload the aliased artifact, run the standard probe, tag
    * rows with the serving version. */
  private[graft] def probeThroughAlias(spark: SparkSession,
      dir: String): DataFrame = {
    import spark.implicits._
    val a = readAlias(aliasPath(dir))
    LloydIvfPq.probe(IndexStore.readIvfPq(spark, a.root))
      .withColumn("serving", lit(a.version))
      .select($"serving", $"query_id", $"rnk", $"vec_id", $"cos_sim")
      .orderBy($"query_id", $"rnk")
  }

  /** The cutover over an arbitrary arrival frame (test seam — the spec
    * feeds the corpus itself to pin the silent-audit/no-swap path). */
  private[graft] def aliasProbeOf(spark: SparkSession, dir: String,
      arrivals: DataFrame): DataFrame = {
    val v1Root = IndexStore.ensureRoot(spark, dir)
    val serving =
      if (decideSwap(spark, dir, arrivals))
        Serving("v2", ensureV2Root(spark, dir))
      else Serving("v1", v1Root)
    writeAlias(aliasPath(dir), serving)
    probeThroughAlias(spark, dir)
  }

  /** The registered query: audit the registered ×2-drift batch, flip
    * the alias to the version the audit calls for (it alarms in every
    * cell, so the deterministic outcome is v2 — recomputed, not
    * assumed, on both engines), probe through the alias. */
  def indexAliasProbe(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    aliasProbeOf(spark, dir, IndexStaleness.driftedArrivals(
      Tables.embeddings(spark, dir).select($"vec_id", $"embedding")))
  }

  /** The oracle: v1's training+probe chain, the x182 ratio chain
    * collapsed to one swap boolean (`dec`), the x183 retrain chain,
    * and a final select that serves whichever version the recomputed
    * decision names. */
  val indexAliasProbeSql: String = {
    val ratio = IndexStaleness.AlarmRatio
    s"""WITH ${LloydIvfPq.trainCtesFor("", "embeddings")},
       |${LloydIvfPq.prSqlFor("", LloydIvfPq.NProbe)},
       |${LloydIvfPq.lutSqlFor("", "pr")},
       |${LloydIvfPq.adcCandSqlFor("", LloydIvfPq.CandK, adaptive = false)},
       |${LloydIvfPq.rerankCteFor("", "embeddings")},
       |${IndexVersions.grownSrcCtes},
       |${IndexStaleness.statCtes("t", "embeddings")},
       |${IndexStaleness.statCtes("z", "arre")},
       |dec AS MATERIALIZED (
       |  SELECT coalesce(bool_or(
       |    CASE WHEN z.n IS NULL OR t.sum_err = 0 THEN FALSE
       |         ELSE (CAST(z.sum_err AS DOUBLE) / z.n)
       |              / (CAST(t.sum_err AS DOUBLE) / t.n) > $ratio END),
       |    FALSE) AS swap
       |  FROM tstat t LEFT JOIN zstat z USING (cell)),
       |${LloydIvfPq.trainCtesFor("r", "src2")},
       |${LloydIvfPq.prSqlFor("r", LloydIvfPq.NProbe)},
       |${LloydIvfPq.lutSqlFor("r", "rpr")},
       |${LloydIvfPq.adcCandSqlFor("r", LloydIvfPq.CandK, adaptive = false)},
       |${LloydIvfPq.rerankCteFor("r", "src2")}
       |SELECT serving, query_id, rnk, vec_id, cos_sim FROM (
       |  SELECT 'v1' AS serving, query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM reranked WHERE NOT (SELECT swap FROM dec)
       |  UNION ALL
       |  SELECT 'v2' AS serving, query_id, vec_id, cos_sim,
       |         row_number() OVER (PARTITION BY query_id
       |                            ORDER BY cos_sim DESC, vec_id ASC) AS rnk
       |  FROM rreranked WHERE (SELECT swap FROM dec))
       |WHERE rnk <= 5
       |ORDER BY query_id, rnk""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x184_index_alias_probe" -> indexAliasProbe _)

  val oracles: Map[String, String] = Map(
    "x184_index_alias_probe" -> indexAliasProbeSql)
}
