package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X32 — SimHash Hamming near-dup JOIN: find all document pairs whose
  * 60-bit shingle-SimHash fingerprints differ in at most
  * [[MaxHamming]] = 3 bits. This is the matching stage x12 (which only
  * computes fingerprints) stops short of, and the third near-dup family
  * next to MinHash/LSH (X2, set-resemblance) and exact n-gram Jaccard
  * (X17): SimHash matches on WEIGHTED cosine-like similarity of the
  * shingle distribution and pays one 8-byte fingerprint per doc — the
  * cheapest index of the three at 100 TB.
  *
  * Scale discipline — the banded pigeonhole trick:
  *  - A pair at Hamming distance ≤ 3 must agree EXACTLY on at least one
  *    of 4 disjoint 15-bit bands (4 bands, ≤ 3 differing bits — one band
  *    is untouched). So candidates come ONLY from an equi-join keyed on
  *    (band_idx, band_value) — never all-pairs — and the banding is
  *    provably LOSSLESS at this threshold, not approximate.
  *  - The oracle states the pure mathematical spec (all pairs with
  *    popcount(xor) ≤ 3, no banding anywhere), so the driver's hash gate
  *    proves the banded plan equals the brute-force semantics.
  *  - Band values are 15 bits ⇒ 32 Ki buckets per band: random
  *    collisions are rare (n²/2^16 per band), and a hot bucket degrades
  *    to a bounded verify cost, never unbounded state. At larger corpus
  *    scale, widen the fingerprint and bands together (k+1 bands of w
  *    bits catch Hamming ≤ k from a (k+1)·w-bit fingerprint) — the same
  *    plan shape at any width.
  *
  * Fingerprint construction: bit p of the SimHash is the sign of
  * Σ_shingles (±1 by bit p of the shingle hash). 60 bits come from two
  * engine-portable 40-bit hashes (`md5Long40(sh)` bits 0–39,
  * `md5Long40(sh ⧺ "#2")` bits 40–59), keeping every value positive-i64
  * and bit-identical in both engines. Unigram-token SimHash is far too
  * weakly discriminating on corpus-shaped text (shared vocabulary ⇒
  * hundreds of zero-distance collisions measured on this corpus);
  * 3-gram shingles give a clean bimodal distance split.
  */
object SimHashDedup {

  val Bits = 60
  val Bands = 4
  val BandBits = 15
  /** Pigeonhole guarantee: [[Bands]] disjoint bands catch every pair at
    * Hamming distance ≤ Bands − 1 via at least one exactly-equal band. */
  val MaxHamming: Int = Bands - 1

  def simhashNearDup(spark: SparkSession, dir: String): DataFrame =
    nearDupOf(Dedup.shinglesOf(Tables.documents(spark, dir)))

  /** 60-bit SimHash fingerprints (doc_id, sim) over a (doc_id, sh)
    * shingle frame. One hash-aggregate keyed on doc_id — map-side
    * partial sums, no intermediate materialization. Docs too short to
    * shingle have no fingerprint (mirrored by the oracle's shingle CTE).
    */
  private[graft] def fingerprintsOf(shingles: DataFrame): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    val hashed = shingles.select($"doc_id",
      md5Long40($"sh").as("h1"),
      md5Long40(concat($"sh", lit("#2"))).as("h2"))
    val sumCols = (0 until Bits).map { p =>
      val (h, b) = if (p < 40) ($"h1", p) else ($"h2", p - 40)
      sum(when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
        .as(s"s$p")
    }
    val sums = hashed.groupBy($"doc_id").agg(sumCols.head, sumCols.tail: _*)
    val bits = (0 until Bits).map(p =>
      when(col(s"s$p") > 0, lit(1L << p)).otherwise(lit(0L)))
    sums.select($"doc_id", bits.reduce(_ + _).as("sim"))
  }

  /** Banded candidate generation + exact popcount verify over any
    * (doc_id, sh) shingle frame. Core of X32; test seam.
    */
  def nearDupOf(shingles: DataFrame): DataFrame = {
    val spark = shingles.sparkSession
    import spark.implicits._
    // one fingerprint row per doc; cached so the self-join's two sides
    // share a single fingerprint build (the x18 lesson: an uncached
    // self-join subplan executes its producer twice)
    val sims = fingerprintsOf(shingles).localCheckpoint()
    val bandStructs = (0 until Bands).map(b =>
      struct(lit(b).as("band"),
        shiftright($"sim", b * BandBits)
          .bitwiseAND(lit((1L << BandBits) - 1)).as("bkey")))
    val banded = sims
      .select($"doc_id", $"sim", explode(array(bandStructs: _*)).as("bk"))
      .select($"doc_id", $"sim", $"bk.band".as("band"), $"bk.bkey".as("bkey"))
    // equi-join keyed on (band, bkey): candidates only from band-bucket
    // collisions; a pair colliding in several bands dedups via distinct
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .distinct()
    cand
      .select($"doc_a", $"doc_b",
        bit_count($"sim_a".bitwiseXOR($"sim_b")).cast("long").as("hamming"))
      .filter($"hamming" <= MaxHamming)
      .orderBy($"doc_a", $"doc_b")
  }

  /** The pure spec: ALL pairs at Hamming ≤ 3, no banding — DuckDB scales
    * to the oracle corpus; the hash gate proves the banded plan equal.
    */
  val simhashNearDupSql: String = {
    val h1 = sqlMd5Long40("sh")
    val h2 = sqlMd5Long40("sh || '#2'")
    val sums = (0 until Bits).map { p =>
      val (h, b) = if (p < 40) ("h1", p) else ("h2", p - 40)
      s"sum(CASE WHEN (($h >> $b) & 1) = 1 THEN 1 ELSE -1 END) AS s$p"
    }.mkString(",\n         ")
    val bits = (0 until Bits)
      .map(p => s"CASE WHEN s$p > 0 THEN ${1L << p} ELSE 0 END")
      .mkString(" + ")
    s"""WITH ${Dedup.shinglesSqlFrom("documents")},
       |hashed AS (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM sh),
       |sums AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM hashed GROUP BY doc_id),
       |s AS (SELECT doc_id, $bits AS sim FROM sums)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sim, b.sim)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x32_simhash_near_dup" -> simhashNearDup _)

  val oracles: Map[String, String] = Map(
    "x32_simhash_near_dup" -> simhashNearDupSql)
}
