package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.sqlMd5Long40

/** X56 — incremental-ingest near-dup screening: a NEW batch of documents
  * arrives against an EXISTING (already-deduplicated) corpus, and each
  * new doc is accepted or rejected — `dup_of_existing` if it
  * near-duplicates any indexed doc, `dup_in_batch` if it only
  * near-duplicates a smaller-id doc in its own batch. This is the
  * production shape of dedup: the full corpus is deduped ONCE (x02/x18);
  * every crawl increment afterward runs this asymmetric screen.
  *
  * The asymmetry is the scale win: the LSH band join puts the EXISTING
  * corpus only on the build side — existing×existing pairs (the
  * overwhelming majority at 100 TB, and all redundant: the index is
  * already deduped) can never fire, so candidate volume scales with the
  * BATCH, not the corpus. Within-batch pairs keep the `doc_a < doc_b`
  * orientation; batch-vs-existing pairs fire in either id order. The
  * same X2 machinery is reused underneath (shingles → 16-min signatures
  * → band buckets → exact-Jaccard verify at ≥ 0.5), so this adds no new
  * estimator — only the ingest-decision topology.
  *
  * The existing/new split is doc_id parity (deterministic and
  * scale-independent); a real deployment keys the same plan off a
  * snapshot boundary. Decision rule mirrored exactly in the oracle:
  * existing matches dominate; the reported match is the smallest
  * decisive partner id; only rejected docs are emitted.
  */
object IncrementalDedup {

  def incrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val ix = CorpusIndex.index(spark, dir)
    incrementalFrom(ix.shingles, ix.sig)
  }

  /** Core of X56 over any (doc_id, text) frame; test/scale seam. */
  def incrementalOf(docs: DataFrame): DataFrame = {
    val sh = Dedup.shinglesOf(docs).cache()
    incrementalFrom(sh, Dedup.minhashSignatures(sh).cache())
  }

  /** X56 over pre-materialized shingle + signature frames (the shared
    * [[CorpusIndex]] path for the registered query).
    */
  private[graft] def incrementalFrom(sh: DataFrame, sig: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val bands = Dedup.bandsOf(sig)

    val newBands = bands.filter(col("doc_id") % 2 === 1)
    val cand = bands.as("ba")
      .join(newBands.as("bb"),
        col("ba.band_idx") === col("bb.band_idx") &&
          col("ba.band_key") === col("bb.band_key") &&
          (col("ba.doc_id") % 2 === 0 || col("ba.doc_id") < col("bb.doc_id")) &&
          col("ba.doc_id") =!= col("bb.doc_id"))
      .select(col("ba.doc_id").as("doc_a"), col("bb.doc_id").as("doc_b"))
      .distinct()

    Dedup.exactJaccard(cand, sh, sig.select($"doc_id", $"n_sh"))
      .filter($"jaccard" >= 0.5)
      .groupBy($"doc_b")
      .agg(
        count(lit(1)).as("n_matches"),
        sum(when($"doc_a" % 2 === 0, 1L).otherwise(0L)).as("n_existing"),
        min(when($"doc_a" % 2 === 0, $"doc_a")).as("min_existing"),
        min($"doc_a").as("min_any"))
      .select(
        $"doc_b".as("doc_id"),
        when($"n_existing" > 0, lit("dup_of_existing"))
          .otherwise(lit("dup_in_batch")).as("status"),
        $"n_matches",
        when($"n_existing" > 0, $"min_existing")
          .otherwise($"min_any").as("match_id"))
      .orderBy($"doc_id")
  }

  val incrementalDedupSql: String = {
    val hashExpr = sqlMd5Long40("sh")
    val minCols = (0 until Dedup.nHashes)
      .map(j => s"min((h * ${Dedup.A(j)} + ${Dedup.B(j)}) % ${Dedup.P}) AS m$j")
      .mkString(",\n         ")
    val bandSelects = (0 until Dedup.nBands)
      .map(b => s"SELECT doc_id, $b AS band_idx, m${2 * b} || '_' || m${2 * b + 1} AS band_key FROM sig")
      .mkString("\n  UNION ALL ")
    s"""WITH ${Dedup.shinglesSqlFrom("documents")},
       |hashed AS (SELECT doc_id, $hashExpr AS h FROM sh),
       |sig AS (
       |  SELECT doc_id, count(*) AS n_sh,
       |         $minCols
       |  FROM hashed GROUP BY doc_id),
       |bands AS (
       |  $bandSelects),
       |cand AS (
       |  SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
       |  FROM bands ba JOIN bands bb
       |    ON ba.band_idx = bb.band_idx AND ba.band_key = bb.band_key
       |   AND bb.doc_id % 2 = 1
       |   AND (ba.doc_id % 2 = 0 OR ba.doc_id < bb.doc_id)
       |   AND ba.doc_id <> bb.doc_id),
       |inter AS (
       |  SELECT doc_a, doc_b, count(*) AS n_common
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b AND sa.sh = sb.sh
       |  GROUP BY doc_a, doc_b),
       |verified AS (
       |  SELECT doc_a, doc_b
       |  FROM inter
       |  JOIN sig za ON za.doc_id = doc_a
       |  JOIN sig zb ON zb.doc_id = doc_b
       |  WHERE CAST(n_common AS DOUBLE)
       |          / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE) >= 0.5)
       |SELECT doc_b AS doc_id,
       |       CASE WHEN sum(CASE WHEN doc_a % 2 = 0 THEN 1 ELSE 0 END) > 0
       |            THEN 'dup_of_existing' ELSE 'dup_in_batch' END AS status,
       |       count(*) AS n_matches,
       |       CASE WHEN sum(CASE WHEN doc_a % 2 = 0 THEN 1 ELSE 0 END) > 0
       |            THEN min(CASE WHEN doc_a % 2 = 0 THEN doc_a END)
       |            ELSE min(doc_a) END AS match_id
       |FROM verified
       |GROUP BY doc_b
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x56_incremental_dedup" -> incrementalDedup _)

  val oracles: Map[String, String] = Map(
    "x56_incremental_dedup" -> incrementalDedupSql)
}
