package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** X146 — dedup-recall audit: the measured recall of X2's LSH
  * band-bucket CANDIDATE stage against lossless exact-Jaccard ground
  * truth, per similarity band — X100's role (ANN recall audit), played
  * for the dedup family. X65 calibrates the estimator CONDITIONED on
  * candidate pairs, so it cannot see the pairs LSH never surfaced;
  * this op counts exactly those misses, answering "what fraction of
  * true near-duplicates does the production candidate stage find at
  * each similarity level" — the number that justifies the band/row
  * dial (8 bands × 2 rows ⇒ P(candidate) = 1−(1−j²)⁸, ≈1 above
  * j = 0.75, decaying through the gray zone the audit's bands trace).
  *
  * Lossless truth without all-pairs — the X100 device transplanted: a
  * FIXED probe slice (doc_id % 11 = 0, a literal predicate) is
  * exhaustively compared against the whole corpus via the
  * shared-shingle join, which is COMPLETE for any threshold > 0 (a
  * pair with jaccard > 0 shares ≥ 1 shingle by definition — no df
  * filter, unlike X17's rare-shingle blocking, so the truth here is
  * truly lossless above [[MinJaccard]]). Audit cost is
  * slice_fraction × the full join — the slice density is the dial a
  * deployment turns; the per-band recall estimate is unbiased because
  * the slice is hash-arbitrary in doc_id, not similarity-correlated.
  *
  * Exactness: jaccard = n_common/(n_a+n_b−n_common) is one double
  * division of exact i64 operands (identical both engines), the band
  * cut floor(4·j) clamps at 3 via integer least(), and recall is one
  * division of exact counts.
  *
  * Reference scope: no dedup in the reference; engine extension
  * (SURVEY §2.5, the X2/X65/X100 measured-recall discipline).
  */
object DedupRecall {

  /** Probe-slice modulus — the audit density dial, REGISTERED through
    * the [[ScaleCaps.probeMod]] seam (round-17 verdict item 6): default
    * 11, overridable per deployment (`SPARK_GRAFT_PROBE_MOD`). Audit
    * cost is 1/mod × the full join; the per-band recall estimate is
    * unbiased at ANY density because the slice is hash-arbitrary in
    * doc_id — measured at mods {11, 31, 101} × factors {1×, 10×, 30×}
    * in SCALE.md §round-18 (DedupRecallSweep). Resolved once at class
    * init so the engine query and the dumped oracle SQL always carry
    * the same modulus. */
  val ProbeMod: Long = ScaleCaps.probeMod
  /** Ground-truth floor: bands cover [0.25, 1]. */
  val MinJaccard = 0.25

  def dedupRecall(spark: SparkSession, dir: String): DataFrame =
    // memoized corpus frames: shingles + signatures build once per
    // (session, dir) across the whole dedup family
    recallOf(CorpusIndex.shingles(spark, dir),
      CorpusIndex.signatures(spark, dir))

  /** Core of X146 over any (doc_id, sh) shingle frame; test seam. */
  private[graft] def recallOf(sh0: DataFrame): DataFrame =
    recallOf(sh0, Dedup.minhashSignatures(sh0))

  private[graft] def recallOf(sh: DataFrame, sig: DataFrame): DataFrame =
    recallAt(sh, sig, ProbeMod)

  /** [[recallOf]] at an explicit slice density — the sweep's seam
    * (DedupRecallSweep measures recall stability and wall vs `mod`
    * without re-initing the class dial). */
  private[graft] def recallAt(sh: DataFrame, sig: DataFrame,
      mod: Long): DataFrame = {
    // no cache() here: the registered query feeds the CorpusIndex
    // localCheckpoint (already materialized), and a lingering cached
    // shingle frame would substitute an InMemoryRelation into every
    // LATER same-session query whose plan contains the subtree
    // (observed: it reshaped x62/x63's audited plans)
    val spark = sh.sparkSession
    import spark.implicits._
    val probes = sh.filter($"doc_id" % mod === 0)
    // Fused truth count (round-18 optimization): the probe⋈corpus
    // shared-shingle join already enumerates EVERY common shingle of
    // every overlapping pair (complete for jaccard > 0 — any
    // overlapping pair shares a shingle), so n_common is one COUNT
    // aggregate over that join — the previous chain distinct-ed the
    // pairs and re-expanded them through Dedup.exactJaccard's two
    // joins to count the very matches the first join had produced
    // (guide §1.2: don't compute things you throw away). A pair of
    // two probe docs appears in both orientations; the a<b-or-b-not-
    // probe filter keeps exactly one row per common shingle.
    val truthCommon = probes.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") &&
          col("a.doc_id") =!= col("b.doc_id") &&
          (col("a.doc_id") < col("b.doc_id") ||
            col("b.doc_id") % mod =!= 0))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .groupBy($"doc_a", $"doc_b")
      .agg(count(lit(1)).as("n_common"))
    val sizes = sh.groupBy($"doc_id").agg(count(lit(1)).as("n_sh"))
    val truth = truthCommon
      .join(sizes.as("za"), $"doc_a" === col("za.doc_id"))
      .join(sizes.as("zb"), $"doc_b" === col("zb.doc_id"))
      .select($"doc_a", $"doc_b",
        ($"n_common".cast("double") /
          (col("za.n_sh") + col("zb.n_sh") - $"n_common").cast("double"))
          .as("jaccard"))
      .filter($"jaccard" >= MinJaccard)
    // the production candidate stage, restricted to pairs the truth
    // slice can see (probe on either side)
    val lsh = Dedup.minhashCandidates(sig)
      .filter($"doc_a" % mod === 0 || $"doc_b" % mod === 0)
      .withColumn("found", lit(1L))
    truth.join(lsh, Seq("doc_a", "doc_b"), "left")
      .withColumn("band",
        least(floor($"jaccard" * 4).cast("long"), lit(3L)))
      .groupBy($"band")
      .agg(count(lit(1)).as("n_truth"),
        sum(coalesce($"found", lit(0L))).as("n_found"))
      .select($"band", ($"band".cast("double") * 0.25).as("band_lo"),
        $"n_truth", $"n_found",
        ($"n_found".cast("double") / $"n_truth".cast("double"))
          .as("recall"))
      .orderBy($"band")
  }

  val dedupRecallSql: String =
    s"""${Dedup.lshCandidateCtesWith(true)},
       |probes AS (SELECT doc_id, sh FROM sh WHERE doc_id % $ProbeMod = 0),
       |tcand AS MATERIALIZED (
       |  SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
       |         greatest(a.doc_id, b.doc_id) AS doc_b
       |  FROM probes a JOIN sh b
       |    ON a.sh = b.sh AND a.doc_id <> b.doc_id),
       |tinter AS MATERIALIZED (
       |  SELECT doc_a, doc_b, count(*) AS n_common
       |  FROM tcand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b AND sa.sh = sb.sh
       |  GROUP BY doc_a, doc_b),
       |truth AS (
       |  SELECT doc_a, doc_b,
       |         CAST(n_common AS DOUBLE)
       |           / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE) AS jaccard
       |  FROM tinter
       |  JOIN sig za ON za.doc_id = doc_a
       |  JOIN sig zb ON zb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE)
       |          / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE)
       |          >= $MinJaccard),
       |lshp AS (
       |  SELECT doc_a, doc_b, 1 AS found FROM cand
       |  WHERE doc_a % $ProbeMod = 0 OR doc_b % $ProbeMod = 0),
       |banded AS (
       |  SELECT least(CAST(floor(t.jaccard * 4) AS BIGINT), 3) AS band,
       |         coalesce(l.found, 0) AS found
       |  FROM truth t LEFT JOIN lshp l
       |    ON t.doc_a = l.doc_a AND t.doc_b = l.doc_b)
       |SELECT band, CAST(band AS DOUBLE) * 0.25 AS band_lo,
       |       CAST(count(*) AS BIGINT) AS n_truth,
       |       CAST(sum(found) AS BIGINT) AS n_found,
       |       CAST(sum(found) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS recall
       |FROM banded
       |GROUP BY band
       |ORDER BY band""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x146_dedup_recall" -> dedupRecall _)

  val oracles: Map[String, String] = Map(
    "x146_dedup_recall" -> dedupRecallSql)
}
