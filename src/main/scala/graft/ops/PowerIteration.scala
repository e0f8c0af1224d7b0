package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X120 — dominant covariance direction by EXACT integer power
  * iteration: three unrolled matvec rounds v_{k+1} = M·v_k from
  * v₀ = 1 over the re-quantized dimension-covariance matrix — the
  * first PCA axis every whitening / variance-explained audit starts
  * from (X113 computes the covariance; X120 extracts its dominant
  * eigendirection; X102 then asks how much of it a matryoshka prefix
  * keeps). Up to the scale factor a power iterate is defined by, the
  * un-normalized v₃ IS the direction estimate — consumers normalize
  * with one float pass; the engine's job is the exact linear algebra.
  *
  * Exactness — re-quantize once, then never divide: the X113 covariance
  * arrives as the exact fraction cov_num/(n²·10⁸); the matrix entry is
  *
  *   m = floor(cov·10⁴) = (cov_num − posmod(cov_num, n²·10⁴)) ÷ n²·10⁴
  *
  * computed with the positive-mod identity so BOTH engines do the same
  * floor regardless of their native integer-division rounding (Spark
  * `div` truncates, DuckDB `//` floors — stripping the positive
  * remainder first makes the division exact and the question moot).
  * From there every matvec is i64 sums of i64 products. Bounds at
  * D = 64, |x| ≤ 1 (so |m| ≤ 10⁴): |v₁| ≤ D·10⁴ = 6.4·10⁵,
  * |v₂| ≤ 4.1·10¹¹, |v₃| ≤ 2.7·10¹⁷ < 2⁶³ — three rounds exactly fit
  * i64, which is why the unroll stops at three (the X84/X110 pattern:
  * fixed rounds, oracle unrolled the same depth).
  *
  * Scale shape: the matrix is D² rows (4096 at D = 64) — broadcast-
  * sized by construction at any corpus scale, since X113 aggregates it
  * from the data; each matvec is one D²-row join against a broadcast
  * D-row vector and a D-keyed sum. The corpus is touched ONCE (inside
  * X113's shape); the iteration itself is corpus-free.
  *
  * Reference scope: no vector ops in the reference; engine extension
  * (SURVEY §2.5, the X64/X102/X113 embedding-analytics family).
  */
object PowerIteration {

  /** Matrix quantization: m = floor(cov · 1e4); see overflow note. */
  val MQ = 10000L

  def covPowerIteration(spark: SparkSession, dir: String): DataFrame =
    powerIterationOf(Tables.embeddings(spark, dir))

  /** Core of X120 over any (vec_id, embedding) frame; test seam. */
  private[graft] def powerIterationOf(embeddings: DataFrame): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val upper = Covariance.covarianceOf(embeddings)
      .withColumn("mden", $"n" * $"n" * lit(MQ))
      // Spark's pmod is already the positive mod; `div` is exact i64
      // division (and the stripped-remainder dividend is an exact
      // multiple, so truncate-vs-floor cannot differ)
      .withColumn("m", expr("(cov_num - pmod(cov_num, mden)) div mden"))
      .select($"i", $"j", $"m")
    // Materialize the symmetrized matrix ONCE (round-18 optimization):
    // it feeds v1, v2, v3 AND the diagonal of the final select, and
    // without a checkpoint each reference re-executed the whole X113
    // covariance aggregation — the corpus-sized pass — leaving ~7
    // copies of the covariance subtree in the AQE-final plan (537
    // operators). The matrix is ≤ 2·D² rows (8k at D = 64) —
    // broadcast-sized at any corpus scale. The iterates are D rows:
    // checkpointing v1/v2 keeps the final four-way join from
    // re-running the earlier matvecs.
    val full = upper.select($"i", $"j", $"m")
      .union(upper.filter($"i" =!= $"j")
        .select($"j".as("i"), $"i".as("j"), $"m"))
      .localCheckpoint()
    def matvec(v: DataFrame): DataFrame =
      full.join(broadcast(v.withColumnRenamed("j", "i")
          .withColumnRenamed("v", "vin")), "i")
        .groupBy($"j").agg(sum($"m" * $"vin").as("v"))
    val v1 = full.groupBy($"j").agg(sum($"m").as("v")) // v0 = all-ones
      .localCheckpoint()
    val v2 = matvec(v1).localCheckpoint()
    val v3 = matvec(v2)
    full.filter($"i" === $"j").select($"i".as("dim"), $"m".as("m_diag"))
      .join(v1.select($"j".as("dim"), $"v".as("v1")), "dim")
      .join(v2.select($"j".as("dim"), $"v".as("v2")), "dim")
      .join(v3.select($"j".as("dim"), $"v".as("v3")), "dim")
      .orderBy($"dim")
  }

  val covPowerIterationSql: String =
    s"""WITH tok AS (
       |  SELECT vec_id,
       |         CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
       |         CAST(floor(CAST(unnest(embedding) AS DOUBLE)
       |           * ${Covariance.Q}) AS BIGINT) AS q
       |  FROM embeddings),
       |dims AS (
       |  SELECT i, sum(q) AS sx, count(*) AS n FROM tok GROUP BY i),
       |cross_p AS (
       |  SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sxy
       |  FROM tok a JOIN tok b
       |    ON a.vec_id = b.vec_id AND b.i >= a.i
       |  GROUP BY 1, 2),
       |upper_m AS (
       |  SELECT c.i, c.j,
       |         (num - ((num % den) + den) % den) // den AS m
       |  FROM (SELECT c.i, c.j,
       |               di.n * c.sxy - di.sx * dj.sx AS num,
       |               di.n * di.n * $MQ AS den
       |        FROM cross_p c
       |        JOIN dims di ON c.i = di.i
       |        JOIN dims dj ON c.j = dj.i) c),
       |m AS (
       |  SELECT i, j, m FROM upper_m
       |  UNION ALL
       |  SELECT j AS i, i AS j, m FROM upper_m WHERE i <> j),
       |v1 AS (SELECT j, sum(m) AS v FROM m GROUP BY j),
       |v2 AS (SELECT m.j, sum(m.m * v1.v) AS v
       |       FROM m JOIN v1 ON m.i = v1.j GROUP BY m.j),
       |v3 AS (SELECT m.j, sum(m.m * v2.v) AS v
       |       FROM m JOIN v2 ON m.i = v2.j GROUP BY m.j)
       |SELECT u.i AS dim, CAST(u.m AS BIGINT) AS m_diag,
       |       CAST(v1.v AS BIGINT) AS v1,
       |       CAST(v2.v AS BIGINT) AS v2,
       |       CAST(v3.v AS BIGINT) AS v3
       |FROM upper_m u
       |JOIN v1 ON v1.j = u.i
       |JOIN v2 ON v2.j = u.i
       |JOIN v3 ON v3.j = u.i
       |WHERE u.i = u.j
       |ORDER BY dim""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x120_cov_power_iteration" -> covPowerIteration _)

  val oracles: Map[String, String] = Map(
    "x120_cov_power_iteration" -> covPowerIterationSql)
}
