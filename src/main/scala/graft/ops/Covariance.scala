package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X113 — exact quantized covariance of the embedding dimensions: the
  * D×D (upper-triangle) covariance matrix every whitening / PCA /
  * decorrelation step starts from, computed so the two engines agree
  * bit-for-bit (X64 profiles dims in isolation — mean/spread per dim;
  * X113 measures how dims CO-vary, which is what decides whether a
  * matryoshka prefix or a PQ subspace split actually decorrelates).
  *
  * Exactness — quantize FIRST, then stay integer: each element maps to
  * `q = floor(x·10⁴)` (i64) once; every downstream sum (Σqᵢ, Σqᵢqⱼ) is
  * exact integer arithmetic, and the covariance emits as the exact
  * fraction `cov_num = n·Σqᵢqⱼ − Σqᵢ·Σqⱼ`, `cov_den = n²·10⁸` plus ONE
  * IEEE division (the dotQ discipline applied to second moments; a
  * float-accumulated covariance is order-dependent and engine-
  * divergent). Bounds: |q| ≤ 10⁴·max|x|, so cov_num ≤ n²·10⁸ — i64-safe
  * to n ≈ 9·10⁴ per partition-of-ALL-rows... in fact globally, since
  * the sums are corpus totals: safe to n ≈ 3·10⁵ vectors at |x| ≤ 1 and
  * the 10⁴ scale; a larger corpus drops the scale a decade per 100×
  * rows (the documented knob — covariance STRUCTURE needs far less
  * per-element precision than ranking does).
  *
  * Scale shape: quantization is row-local in the scan projection; the
  * per-dim sums are one map-side-combined aggregate; the cross-products
  * come from a vec_id-keyed SELF-join of the exploded (vec, dim, q)
  * stream (co-partitioned — one exchange each side, D(D+1)/2 rows per
  * vector) feeding a (i, j)-keyed partial agg bounded by D² cells. For
  * very wide D the same shape shards by (i-block, j-block); at D = 64
  * the matrix is 2080 output rows. Nothing global but the final
  * ORDER BY.
  *
  * Reference scope: no vector ops in the reference; engine extension
  * (SURVEY §2.5, the X48/X64/X102 embedding-analytics family).
  */
object Covariance {

  /** Quantization scale: 1e4 per element (see overflow note above). */
  val Q = 10000.0

  def dimCovariance(spark: SparkSession, dir: String): DataFrame =
    covarianceOf(Tables.embeddings(spark, dir))

  /** Core of X113 over any (vec_id, embedding) frame; test seam. */
  private[graft] def covarianceOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tok = embeddings
      .select($"vec_id", posexplode($"embedding").as(Seq("i", "x")))
      .select($"vec_id", $"i".cast("long").as("i"),
        floor($"x".cast("double") * Q).cast("long").as("q"))
    val dims = tok.groupBy($"i")
      .agg(sum($"q").as("sx"), count(lit(1)).as("n"))
    val cross = tok.as("a").join(tok.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("b.i") >= col("a.i"))
      .select(col("a.i").as("i"), col("b.i").as("j"),
        (col("a.q") * col("b.q")).as("qq"))
      .groupBy($"i", $"j").agg(sum($"qq").as("sxy"))
    cross
      .join(broadcast(dims.select($"i", $"sx".as("sx_i"), $"n")), "i")
      .join(broadcast(dims.select($"i".as("j"), $"sx".as("sx_j"))), "j")
      .select($"i", $"j", $"n", $"sxy", $"sx_i", $"sx_j",
        ($"n" * $"sxy" - $"sx_i" * $"sx_j").as("cov_num"),
        ($"n" * $"n" * lit((Q * Q).toLong)).as("cov_den"),
        (($"n" * $"sxy" - $"sx_i" * $"sx_j").cast("double") /
          ($"n" * $"n" * lit((Q * Q).toLong)).cast("double")).as("cov_q"))
      .orderBy($"i", $"j")
  }

  val dimCovarianceSql: String =
    s"""WITH tok AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * $Q)
       |           AS BIGINT) AS q
       |  FROM embeddings),
       |dims AS (
       |  SELECT i, sum(q) AS sx, count(*) AS n FROM tok GROUP BY i),
       |cross_p AS (
       |  SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sxy
       |  FROM tok a JOIN tok b
       |    ON a.vec_id = b.vec_id AND b.i >= a.i
       |  GROUP BY 1, 2)
       |SELECT c.i, c.j, CAST(di.n AS BIGINT) AS n,
       |       CAST(c.sxy AS BIGINT) AS sxy,
       |       CAST(di.sx AS BIGINT) AS sx_i,
       |       CAST(dj.sx AS BIGINT) AS sx_j,
       |       CAST(di.n * c.sxy - di.sx * dj.sx AS BIGINT) AS cov_num,
       |       CAST(di.n * di.n * ${(Q * Q).toLong} AS BIGINT) AS cov_den,
       |       CAST(di.n * c.sxy - di.sx * dj.sx AS DOUBLE)
       |         / CAST(di.n * di.n * ${(Q * Q).toLong} AS DOUBLE) AS cov_q
       |FROM cross_p c
       |JOIN dims di ON c.i = di.i
       |JOIN dims dj ON c.j = dj.i
       |ORDER BY c.i, c.j""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x113_dim_covariance" -> dimCovariance _)

  val oracles: Map[String, String] = Map(
    "x113_dim_covariance" -> dimCovarianceSql)
}
