package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X140 — explicit-register HyperLogLog per source, the op that closes
  * the b11 gap: Spark's `approx_count_distinct` is rows-only by
  * declared design because its HLL++ state is implementation-defined,
  * but the HLL ALGORITHM is not — a register is "max leading-zero rank
  * among hashes landing in this bucket", a pure deterministic function
  * of the data, so building the registers explicitly makes the sketch
  * (and its estimate) fully hash-checkable cross-engine (Flajolet et
  * al. 2007, the m=64 small-m regime with the linear-counting
  * small-range correction).
  *
  * Exactness discipline: bucket j = h & 63 and payload w = h >> 6 are
  * bitwise ops on the engine-portable md5Long40; the rank ρ =
  * 35 − bitlen(w) uses `length(bin(w))` — BOTH engines' `bin` is
  * minimal-width binary, so bitlen is an integer both agree on
  * (w = 0 ⟹ ρ = 35). The indicator sum S = Σ 2^(−M_j) is a sum of ≤64
  * dyadic rationals with denominator ≤ 2³⁵ (never-hit registers
  * contribute 2⁰ = 1), so every partial sum is EXACTLY representable
  * in a double (numerator < 2⁴¹ ≪ 2⁵³) — the float sum is
  * order-independent and hash-green, no decimal cast needed. The raw
  * estimate α·m²/S is one IEEE division of identical operands; only
  * the small-range branch m·ln(m/V) touches libm, so only it is
  * round(·, 6)-aligned (the house determinism rule).
  *
  * Scale shape: NO upstream distinct and no per-value state — max() is
  * idempotent, so duplicates collapse inside the partial aggregate and
  * the map side ships at most 64 (grp, j, m) rows per partition. State
  * is 64 registers per group at ANY corpus size; registers from shards
  * or days merge by element-wise MAX (the strongest merge law after
  * X136's linear counters — HllSpec pins shard-merge ≡ direct).
  * The exact countDistinct audit column (X100 pattern) is the one
  * Expand-based pass a deployment would drop — the sketch is the
  * answer at scale.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, completing the cardinality corner of the sketch
  * family: B11 impl-defined HLL, X134/X139 KMV, X140 checkable HLL).
  */
object Hll {

  /** Register count m (2⁶ buckets — j is the low 6 hash bits). */
  val M = 64
  /** Bias constant α₆₄ (Flajolet et al. 2007, α_m for m = 64). */
  val Alpha = 0.709

  def hllRegisters(spark: SparkSession, dir: String): DataFrame =
    hllOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("text").as("v")))

  /** Register frame (grp, j, m) — the sketch state; merge seam. */
  private[graft] def regsOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows
      .select($"grp", Hashing.md5Long40($"v").as("h"))
      .select($"grp",
        $"h".bitwiseAND(lit(63L)).as("j"),
        shiftright($"h", 6).as("w"))
      .withColumn("rho",
        when($"w" === 0L, lit(35L))
          .otherwise(lit(35L) - length(bin($"w")).cast("long")))
      .groupBy($"grp", $"j")
      .agg(max($"rho").as("m"))
  }

  /** Estimate columns from a register frame alone (the K-bounded-state
    * law: no look-back at the data).
    */
  private[graft] def estimateOf(regs: DataFrame): DataFrame = {
    val spark = regs.sparkSession
    import spark.implicits._
    regs
      .withColumn("term",
        expr("cast(1 as double) / cast(shiftleft(1L, cast(m as int)) as double)"))
      .groupBy($"grp")
      .agg(count(lit(1)).as("n_regs"), sum($"term").as("s_present"))
      .withColumn("v_zero", lit(M.toLong) - $"n_regs")
      .withColumn("s_sum", $"s_present" + $"v_zero".cast("double"))
      .withColumn("est_raw",
        (lit(Alpha) * lit((M * M).toDouble)) / $"s_sum")
      .withColumn("est",
        when($"v_zero" > 0L && $"est_raw" <= lit(2.5 * M),
          round(lit(M.toDouble) * log(lit(M.toDouble) /
            $"v_zero".cast("double")), 6))
          .otherwise($"est_raw"))
      .drop("s_present")
  }

  /** Core of X140 over any (grp, v) frame; test seam. */
  private[graft] def hllOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val audit = rows
      .select($"grp", Hashing.md5Long40($"v").as("h"))
      .groupBy($"grp")
      .agg(countDistinct($"h").as("n_distinct"))
    estimateOf(regsOf(rows))
      .join(audit, Seq("grp"))
      .select($"grp", $"n_distinct", $"n_regs", $"v_zero",
        $"s_sum", $"est_raw", $"est")
      .orderBy($"grp")
  }

  val hllRegistersSql: String = {
    val h = Hashing.sqlMd5Long40("v")
    s"""WITH rws AS (
       |  SELECT source AS grp, $h AS h
       |  FROM (SELECT source, text AS v FROM documents)),
       |reg AS (
       |  SELECT grp, h & 63 AS j,
       |         max(CASE WHEN (h >> 6) = 0 THEN 35
       |                  ELSE 35 - length(bin(h >> 6)) END) AS m
       |  FROM rws GROUP BY grp, h & 63),
       |agg AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_regs,
       |         sum(CAST(1 AS DOUBLE)
       |               / CAST((CAST(1 AS BIGINT) << m) AS DOUBLE))
       |           AS s_present
       |  FROM reg GROUP BY grp),
       |est0 AS (
       |  SELECT grp, n_regs, CAST($M - n_regs AS BIGINT) AS v_zero,
       |         s_present + CAST($M - n_regs AS DOUBLE) AS s_sum
       |  FROM agg),
       |est1 AS (
       |  SELECT grp, n_regs, v_zero, s_sum,
       |         (CAST($Alpha AS DOUBLE) * CAST(${M * M} AS DOUBLE))
       |           / s_sum AS est_raw
       |  FROM est0),
       |aud AS (
       |  SELECT grp, CAST(count(DISTINCT h) AS BIGINT) AS n_distinct
       |  FROM rws GROUP BY grp)
       |SELECT e.grp, aud.n_distinct, e.n_regs, e.v_zero, e.s_sum,
       |       e.est_raw,
       |       CASE WHEN e.v_zero > 0 AND e.est_raw <= ${2.5 * M}
       |            THEN round(CAST($M AS DOUBLE)
       |                         * ln(CAST($M AS DOUBLE)
       |                                / CAST(e.v_zero AS DOUBLE)), 6)
       |            ELSE e.est_raw END AS est
       |FROM est1 e JOIN aud ON e.grp = aud.grp
       |ORDER BY e.grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x140_hll_registers" -> hllRegisters _)

  val oracles: Map[String, String] = Map(
    "x140_hll_registers" -> hllRegistersSql)
}
