package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TopKLongPairs

/** X92 — 1-bit (sign) embedding quantization + exact Hamming top-k: the
  * binary-codes ANN baseline. Every 64-dim float vector compresses
  * 256× to two 32-bit sign words (bit i = 1 iff dim i ≥ 0 — the
  * hyperplane family X14 uses, at zero projection cost), and neighbor
  * candidates rank by Hamming distance = popcount(xor) over the packed
  * words: 4 ALU ops per comparison instead of 64 FMAs.
  *
  * Unlike the float ANN family (X14/X19/X31/X79 — approximate BY
  * CONSTRUCTION, rows-only correctness), this operator is end-to-end
  * ORACLE-EXACT: sign extraction (`x ≥ 0`) has no floating-point
  * accumulation surface, packing is integer, Hamming is integer, ties
  * break on vec_id — so the DuckDB hash gate proves the whole pipeline
  * (pack → xor → popcount → grouped top-k) bit-equal. That makes X92
  * the calibration anchor the approximate family is measured against.
  *
  * Scale shape: packing is one row-local projection (the corpus never
  * re-reads); the query set (5 vectors here, a few thousand in
  * production) broadcasts; per-query top-k runs through
  * [[TopKLongPairs]], so each map task ships ≤ k pairs per query —
  * no corpus shuffle, no window sort. At 100 TB the packed corpus is
  * 16 bytes/vector — small enough to keep hot, which is exactly why
  * binary sketches are the standard first-pass filter in front of
  * exact rerank.
  *
  * Reference scope: the reference has no vector surface; this is the
  * mandated similarity-search extension set (SURVEY §2.5).
  */
object BitSim {

  val K = 10
  val NQueries = 5

  /** Sign-packed corpus: (vec_id, lo, hi) with lo = dims 1..32, hi =
    * dims 33..64, bit (i−1 mod 32) set iff the dim is ≥ 0.
    */
  private[graft] def packedOf(embeddings: DataFrame): DataFrame = {
    def word(offset: Int): String =
      s"""aggregate(
         |  transform(slice(embedding, ${offset + 1}, 32),
         |    (x, i) -> IF(x >= cast(0 as float),
         |                 shiftleft(cast(1 as bigint), i),
         |                 cast(0 as bigint))),
         |  cast(0 as bigint), (acc, v) -> acc + v)""".stripMargin
    embeddings.selectExpr("vec_id", s"${word(0)} as lo", s"${word(32)} as hi")
  }

  def hammingTopK(spark: SparkSession, dir: String): DataFrame =
    hammingTopKOf(Tables.embeddings(spark, dir))

  /** Core over any embeddings-shaped frame; test seam. */
  private[graft] def hammingTopKOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val packed = packedOf(embeddings)
    val q = packed.filter($"vec_id" < NQueries)
      .select($"vec_id".as("q_id"), $"lo".as("qlo"), $"hi".as("qhi"))
    val tk = udaf(new TopKLongPairs(K))
    packed.join(broadcast(q), $"vec_id" =!= $"q_id")
      .select($"q_id",
        (expr("cast(bit_count(lo ^ qlo) as bigint)") +
          expr("cast(bit_count(hi ^ qhi) as bigint)")).as("hamming"),
        $"vec_id")
      .groupBy($"q_id")
      .agg(tk($"hamming", $"vec_id").as("top"))
      .select($"q_id", posexplode($"top"))
      .select($"q_id", ($"pos" + 1).cast("long").as("rk"),
        $"col._2".as("vec_id"), $"col._1".as("hamming"))
      .orderBy($"q_id", $"rk")
  }

  val hammingTopKSql: String =
    s"""WITH b AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
       |         unnest(embedding) AS e
       |  FROM embeddings),
       |packed AS (
       |  SELECT vec_id,
       |    CAST(sum(CASE WHEN i <= 32 AND e >= 0
       |      THEN (1::BIGINT << (i - 1)) ELSE 0 END) AS BIGINT) AS lo,
       |    CAST(sum(CASE WHEN i > 32 AND e >= 0
       |      THEN (1::BIGINT << (i - 33)) ELSE 0 END) AS BIGINT) AS hi
       |  FROM b GROUP BY vec_id),
       |q AS (SELECT vec_id AS q_id, lo AS qlo, hi AS qhi
       |      FROM packed WHERE vec_id < $NQueries),
       |d AS (
       |  SELECT q.q_id, p.vec_id,
       |         CAST(bit_count(xor(p.lo, q.qlo))
       |            + bit_count(xor(p.hi, q.qhi)) AS BIGINT) AS hamming
       |  FROM packed p JOIN q ON p.vec_id <> q.q_id)
       |SELECT q_id, rk, vec_id, hamming FROM (
       |  SELECT q_id, vec_id, hamming,
       |         CAST(row_number() OVER (
       |           PARTITION BY q_id ORDER BY hamming, vec_id) AS BIGINT) AS rk
       |  FROM d)
       |WHERE rk <= $K
       |ORDER BY q_id, rk""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x92_hamming_topk" -> hammingTopK _)

  val oracles: Map[String, String] = Map(
    "x92_hamming_topk" -> hammingTopKSql)
}
