package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** X105 — sorted-neighborhood blocking (Hernández–Stolfo) for near-dup
  * detection: sort the corpus ONCE by a similarity-correlated key, take
  * as candidates only pairs within [[WindowSize]] positions of each
  * other, verify with exact Jaccard at the X2 threshold. The third
  * classic blocking family next to LSH band-buckets (X2/X14) and
  * prefix-filtering (X62/X63) — and the one with a LINEAR candidate
  * bound: exactly `W·n` candidate pairs REGARDLESS of key skew, where
  * LSH pays the square of every hot bucket and prefix-filter the square
  * of every hot token's posting list. The trade is recall: a pair is
  * found only if the sort puts it within W positions, so the window is
  * the knob between the two (the engine's LSH form stays the default;
  * X105 is the bounded-cost screen for skew-hostile corpora).
  *
  * Sort key: the first MinHash value `m0` (from the shared
  * [[CorpusIndex]] signature table) — two docs with Jaccard J share
  * their min-shingle-hash with probability J, and sharing it means
  * EQUAL keys, hence adjacent ranks (a 1-row LSH band flattened onto a
  * number line). A content prefix would be cheaper but catches only
  * shared-prefix dups; m0 is permutation-invariant.
  *
  * The global rank never funnels through one task: m0's range is known
  * ([0, [[Dedup.P]])), so the rank decomposes by the X97 two-phase
  * pattern — constant-width buckets (order-preserving: pid asc, (m0,
  * doc_id) asc ⟺ global (m0, doc_id) asc), per-bucket row_number, bucket
  * offsets via the triangular broadcast join; result invariant to the
  * parallelism that sizes the buckets. Rank-adjacency candidates come
  * from an EQUI-join (each doc emits W cover keys rn+1…rn+W — never a
  * range join), and each unordered pair is generated exactly once, at
  * its rank gap. Verification reuses the shared shingle frame
  * ([[Dedup.exactJaccard]]) — identical verify stage to X2/X17, so the
  * three blocking strategies differ ONLY in candidate generation.
  *
  * Reference scope: no dedup in the reference; engine extension
  * (SURVEY §2.5, the X2/X17/X62/X63 blocking family).
  */
object SortedNeighborhood {

  /** Rank-adjacency width: candidates are pairs ≤ W positions apart in
    * the sorted order — the linear-cost knob (W·n candidate pairs).
    */
  val WindowSize = 5

  def snDedup(spark: SparkSession, dir: String): DataFrame =
    snFrom(CorpusIndex.shingles(spark, dir),
      CorpusIndex.signatures(spark, dir))

  /** Core of X105 over any shingle frame (doc_id, sh) and signature
    * frame carrying (doc_id, n_sh, m0); test seam.
    */
  private[graft] def snFrom(sh: DataFrame, sig: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    val width = Dedup.P / parallelism + 1L
    val keyed = sig.select($"doc_id", $"n_sh", $"m0")
      .withColumn("pid", expr(s"m0 div ${width}L"))
      .localCheckpoint()
    val local = keyed.withColumn("lrk",
      row_number().over(
        Window.partitionBy($"pid").orderBy($"m0", $"doc_id")).cast("long"))
    val counts = keyed.groupBy($"pid").agg(count(lit(1)).as("c"))
    val offsets = counts.as("a")
      .join(counts.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.c")), lit(0L)).as("off"))
    val ranked = local.join(broadcast(offsets), "pid")
      .select($"doc_id", ($"off" + $"lrk").as("rn"))
    // each unordered pair once, at its rank gap, via W cover keys
    val covers = ranked.select($"doc_id".as("id_a"),
      explode(sequence($"rn" + 1, $"rn" + WindowSize)).as("rn"))
    val cand = covers.join(ranked.select($"doc_id".as("id_b"), $"rn"), "rn")
      .select(least($"id_a", $"id_b").as("doc_a"),
        greatest($"id_a", $"id_b").as("doc_b"))
    Dedup.exactJaccard(cand, sh, sig.select($"doc_id", $"n_sh"))
      .filter($"jaccard" >= 0.5)
      .orderBy($"doc_a", $"doc_b")
  }

  val snDedupSql: String = {
    val hashExpr = graft.functions.Hashing.sqlMd5Long40("sh")
    s"""WITH ${Dedup.shinglesSqlFrom("documents")},
       |hashed AS (SELECT doc_id, $hashExpr AS h FROM sh),
       |sig AS (
       |  SELECT doc_id, count(*) AS n_sh,
       |         min((h * ${Dedup.A(0)} + ${Dedup.B(0)}) % ${Dedup.P}) AS m0
       |  FROM hashed GROUP BY doc_id),
       |rn AS (
       |  SELECT doc_id, n_sh, m0,
       |         row_number() OVER (ORDER BY m0, doc_id) AS rn
       |  FROM sig),
       |cand AS (
       |  SELECT least(a.doc_id, b.doc_id) AS doc_a,
       |         greatest(a.doc_id, b.doc_id) AS doc_b
       |  FROM rn a JOIN rn b
       |    ON b.rn > a.rn AND b.rn <= a.rn + $WindowSize),
       |inter AS (
       |  SELECT doc_a, doc_b, count(*) AS n_common
       |  FROM cand
       |  JOIN sh sa ON sa.doc_id = doc_a
       |  JOIN sh sb ON sb.doc_id = doc_b AND sa.sh = sb.sh
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b, za.n_sh AS n_sh_a, zb.n_sh AS n_sh_b, n_common,
       |       CAST(n_common AS DOUBLE)
       |         / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE) AS jaccard
       |FROM inter
       |JOIN sig za ON za.doc_id = doc_a
       |JOIN sig zb ON zb.doc_id = doc_b
       |WHERE CAST(n_common AS DOUBLE)
       |        / CAST(za.n_sh + zb.n_sh - n_common AS DOUBLE) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x105_sorted_neighborhood" -> snDedup _)

  val oracles: Map[String, String] = Map(
    "x105_sorted_neighborhood" -> snDedupSql)
}
