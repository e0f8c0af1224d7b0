package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.{md5Long40, sqlMd5Long40}

/** X136 — AMS (Alon–Matias–Szegedy) F2 / self-join-size sketch per
  * source: estimates Σ_v c_v² — the row count an equality self-join on
  * content produces — from R=32 signed counters per group, in ONE
  * linear pass with NO per-value state. This is the planning quantity
  * behind the whole candidate-cap posture (x62/x63's MaxCand, x125's
  * MaxDf): a quadratic blow-up hiding in a key distribution is exactly
  * F2, and this sketch prices it BEFORE the join runs, at a state size
  * (R counters) independent of both corpus size and distinct-value
  * count — the 100 TB pre-flight check. Exact F2 needs a (grp, v)
  * aggregate whose state is the number of DISTINCT contents; the
  * sketch needs 32 longs.
  *
  * ORACLE-CHECKABLE like X134/X135 and, uniquely in the family,
  * integer-only end to end: counter r is X_r = Σ_rows s_r(v) with
  * s_r(v) = ±1 from bit r of the engine-portable md5Long40(v) (one
  * hash per row, 32 sign functions from its low bits — the formal
  * 4-wise-independence construction would affine-mix one hash per r;
  * cryptographic-hash bits exceed that in practice and keep the row
  * cost at ONE digest). E[X_r²] = F2 exactly (Alon et al. 1996);
  * est = (Σ_r X_r²) div R — the unbiased mean-of-squares with floor
  * division both engines agree on (rel. stderr ≈ √(2/R) ≈ 25% in the
  * all-distinct worst case, sharper the heavier the skew — and skew is
  * what it exists to detect; a group with ONE distinct value estimates
  * exactly: every X_r = ±n so est = n²). Everything is i64: signs,
  * sums, squares, the division — no float license needed anywhere.
  *
  * MERGEABLE in the strongest (linear) sense: X_r(A ⊎ B) =
  * X_r(A) + X_r(B), so shards/partitions/days combine by vector
  * ADDITION — partial aggregation IS the merge, deletions subtract,
  * and a cross-shard union never resamples. The registered query
  * carries exact F2 alongside (the X100/X135 audit pattern);
  * production keeps only [[sketchOf]].
  *
  * Overflow headroom: |X_r| ≤ n so Σ_r X_r² ≤ R·n²; i64 holds to
  * n ≈ 5.4e8 rows per group at R=32 — past that, production widens
  * the squares to DECIMAL. All audited scales are ~10⁶× inside.
  *
  * Scale shape: one map-side-combined groupBy(grp) over a single
  * projection of the corpus (the 32 sign sums are ONE aggregate's
  * columns, not 32 passes); the exact-audit branch is a second
  * (grp, v)-keyed aggregate the production form drops. Output is
  * |groups| rows.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, the B11/X45/X134/X135 sketch family).
  */
object AmsF2 {

  /** Counter count; rel. stderr ≈ √(2/R) ≈ 25% in the diffuse regime. */
  val R = 32

  def amsF2(spark: SparkSession, dir: String): DataFrame =
    f2Of(Tables.documents(spark, dir).select(
      col("source").as("grp"), col("text").as("v")))

  /** The sketch state: per group, the R signed counters (x0..x31) plus
    * the row count. Linear in the input — the merge-law seam.
    */
  private[graft] def sketchOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val signed = rows.select($"grp", md5Long40($"v").as("h0"))
    val sums: Seq[Column] = count(lit(1)).cast("long").as("n_rows") +:
      (0 until R).map(r => sum(
        when(shiftright($"h0", r).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"x$r"))
    signed.groupBy($"grp").agg(sums.head, sums.tail: _*)
  }

  /** est_f2 from a sketch frame: (Σ_r x_r²) div R — pure i64. */
  private[graft] def estimateOf(sketch: DataFrame): DataFrame = {
    val ss = (0 until R).map(r => col(s"x$r") * col(s"x$r"))
      .reduce(_ + _)
    sketch.withColumn("ss", ss)
      .select(col("grp"), col("n_rows"), expr(s"ss div $R").as("est_f2"))
  }

  /** Core of X136 over any (grp, v) frame: sketch estimate joined with
    * the exact audit columns (production drops the exact branch).
    */
  private[graft] def f2Of(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val est = estimateOf(sketchOf(rows))
    val exact = rows.groupBy($"grp", $"v").agg(
        count(lit(1)).cast("long").as("c"))
      .groupBy($"grp").agg(
        count(lit(1)).as("n_distinct"),
        sum($"c" * $"c").as("exact_f2"))
    est.join(exact, Seq("grp"))
      .select($"grp", $"n_rows", $"n_distinct", $"est_f2", $"exact_f2")
      .orderBy($"grp")
  }

  val amsF2Sql: String = {
    val h = sqlMd5Long40("v")
    val xs = (0 until R).map { r =>
      s"CAST(sum(CASE WHEN (h // ${1L << r}) % 2 = 1 THEN 1 ELSE -1 " +
        s"END) AS BIGINT) AS x$r"
    }.mkString(",\n         ")
    val ss = (0 until R).map(r => s"x$r * x$r").mkString(" + ")
    s"""WITH signed AS (
       |  SELECT grp, $h AS h
       |  FROM (SELECT source AS grp, text AS v FROM documents)),
       |sk AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_rows,
       |         $xs
       |  FROM signed GROUP BY grp),
       |exact AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_distinct,
       |         CAST(sum(c * c) AS BIGINT) AS exact_f2
       |  FROM (SELECT source AS grp, text AS v, count(*) AS c
       |        FROM documents GROUP BY 1, 2)
       |  GROUP BY grp)
       |SELECT sk.grp, n_rows, n_distinct,
       |       ($ss) // $R AS est_f2, exact_f2
       |FROM sk JOIN exact ON sk.grp = exact.grp
       |ORDER BY sk.grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x136_ams_f2" -> amsF2 _)

  val oracles: Map[String, String] = Map(
    "x136_ams_f2" -> amsF2Sql)
}
