package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.md5Long40

/** X147 — signed random projection (Johnson–Lindenstrauss) embedding
  * sketch, integer-exact: every D-dim embedding compressed to P = 16
  * signed-sum coordinates y_p = Σ_d s(p,d)·q_d with s(p,d) ∈ {−1, +1}
  * — the Achlioptas (2003) database-friendly JL construction (±1
  * entries preserve pairwise distances in expectation like Gaussian
  * entries, at integer cost). The dimensionality-reduction step the
  * family was missing: X48 quantizes per-coordinate (no dim cut), X102
  * truncates a trained nested embedding, X120 finds ONE principal
  * direction; X147 is the data-independent D→P cut that needs no
  * training pass at all.
  *
  * The matrix-free trick: the sign matrix is never built or shipped —
  * s(p,d) = 1 − 2·(md5Long40("jl:p:d") & 1) is recomputed row-locally
  * by any executor (the hash IS the matrix, infinitely sharded), so
  * the projection is a map-only pass with no broadcast, no state, and
  * no coordination. The P per-row hash evaluations trade CPU for zero
  * data movement — the right trade on an IO-bound 100 TB scan.
  *
  * Exactness: q_d = floor(v_d·10⁶) is the value-exact i64 quantization
  * (IEEE multiply + floor, deterministic), signs are exact bits of the
  * portable hash, and each y_p is a pure i64 sum — order-independent,
  * hash-green, |y_p| ≤ D·10⁶ ≪ 2⁶³. No float leaves the query.
  *
  * Scale shape: ONE posexplode + ONE (vec_id)-keyed aggregate with all
  * P sums as map-side-combined columns (no P× row blowup — the P sums
  * ride the same exploded stream); output is |vecs| rows × P columns.
  *
  * Reference scope: no embeddings in the reference; engine extension
  * (SURVEY §2.5, the X48/X102/X120 representation family).
  */
object JlProjection {

  /** Output dimensionality (code constant). */
  val P = 16

  def jlProjection(spark: SparkSession, dir: String): DataFrame =
    projectionOf(Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")))

  /** s(p,d) as a column expression over the dim column. */
  private def sign(p: Int, d: Column): Column =
    lit(1L) - lit(2L) * md5Long40(
      concat(lit(s"jl:$p:"), d.cast("string"))).bitwiseAND(lit(1L))

  /** Core of X147 over any (vec_id, embedding) frame; test seam. */
  private[graft] def projectionOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val exploded = e
      .select($"vec_id", posexplode($"embedding").as(Seq("d", "v")))
      .select($"vec_id", $"d",
        floor($"v".cast("double") * 1e6).cast("long").as("q"))
    val sums = (0 until P).map(p =>
      sum(sign(p, $"d") * $"q").as(s"y$p"))
    exploded
      .groupBy($"vec_id")
      .agg(sums.head, sums.tail: _*)
      .orderBy($"vec_id")
  }

  val jlProjectionSql: String = {
    def h(p: Int) =
      s"CAST(md5_number_lower('jl:$p:' || CAST(i - 1 AS VARCHAR)) " +
        s"% 1099511627776 AS BIGINT)"
    val sums = (0 until P).map(p =>
      s"CAST(sum((1 - 2 * (${h(p)} & 1)) * q) AS BIGINT) AS y$p")
      .mkString(",\n       ")
    s"""WITH ex AS (
       |  SELECT vec_id, i,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6)
       |           AS BIGINT) AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i))
       |SELECT vec_id,
       |       $sums
       |FROM ex
       |GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x147_jl_projection" -> jlProjection _)

  val oracles: Map[String, String] = Map(
    "x147_jl_projection" -> jlProjectionSql)
}
