package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X155 — Benford first-digit audit: per order-priority class, the
  * distribution of leading digits of order totals against Benford's law
  * (P(d) = log₁₀(1 + 1/d), Newcomb 1881 / Benford 1938) with a χ²
  * statistic — the classical fabricated-or-degenerate-data screen a
  * quality pipeline runs on any multiplicative-scale measure (amounts,
  * populations, file sizes). Complements the quality family on the
  * NUMERIC axis: X149 asserts declared contracts, X117/X141 compare
  * distributions to EACH OTHER, X155 compares one distribution to a
  * closed-form law. (TPC-H-style synthetic prices are near-uniform over
  * a range, NOT Benford — the audit correctly reports that with a huge
  * χ², which is itself the point: the statistic separates data shapes,
  * and the spec pins a constructed log-uniform sample passing it.)
  *
  * Exactness: the leading digit is extracted arithmetically-then-
  * lexically — floor(x) is an exact i64 (totals ≥ 1), its decimal
  * string is engine-identical, substr(·,1,1) is the digit — no log10
  * float on the data path; per-class digit counts are exact i64 pivots
  * (one map-side-combined aggregate); the nine expected probabilities
  * are COMPILE-TIME double literals (computed once in Scala, embedded
  * verbatim in both the plan and the oracle SQL — zero cross-engine
  * libm exposure); χ² and max deviation are fixed-order expressions of
  * exact counts and those literals (identical operands, identical
  * order, identical IEEE results).
  *
  * Scale shape: ONE scan, one |classes|-group aggregate with nine
  * conditional counts riding it; |classes| output rows. Nothing else.
  *
  * Reference scope: no numeric auditing in the reference; engine
  * extension (SURVEY §2.5, the X149/X117/X141 quality family).
  */
object Benford {

  /** Benford probabilities for digits 1..9, computed once and embedded
    * as literals in BOTH engines' expressions. */
  val P: Seq[Double] = (1 to 9).map(d => math.log10(1.0 + 1.0 / d))

  def benfordAudit(spark: SparkSession, dir: String): DataFrame =
    benfordOf(Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("grp"),
        col("o_totalprice").as("v")))

  /** Core of X155 over any (grp, v) frame; test seam. Rows with
    * v < 1 (no leading digit 1–9: zero, negative, sub-unit fractions)
    * are excluded BEFORE counting — enforced in the plan, not left as a
    * doc-comment contract, so n is exactly Σ d1..d9 and the χ²
    * expectations n·p(d) stay calibrated to the observed digit counts
    * on any input the seam receives (round-13 advice item).
    */
  private[graft] def benfordOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val digit = substring(floor($"v").cast("long").cast("string"), 1, 1)
      .cast("int")
    val obs: Seq[Column] = (1 to 9).map(d =>
      sum(when(digit === d, 1L).otherwise(0L)).as(s"d$d"))
    val aggs = count(lit(1)).as("n") +: obs
    val counted = rows
      .filter($"v" >= 1)
      .groupBy($"grp")
      .agg(aggs.head, aggs.tail: _*)
    // χ² = Σ (obs − n·p)²/(n·p): each term is a fixed-order double of
    // identical operands, but the nine-term ADD chain is where a fused
    // multiply-add in either engine's compiled evaluator can shift an
    // ulp — so quantize per term to i64 (the X156 trick) and sum the
    // integers exactly; one final division back to double
    val chi2 = (1 to 9).map { d =>
      val e = $"n".cast("double") * lit(P(d - 1))
      floor((col(s"d$d").cast("double") - e) *
        (col(s"d$d").cast("double") - e) / e * lit(1e6)).cast("long")
    }.reduce(_ + _).cast("double") / lit(1e6)
    val maxDev = (1 to 9).map { d =>
      abs(col(s"d$d").cast("double") / $"n".cast("double") - lit(P(d - 1)))
    }.reduce((a, b) => greatest(a, b))
    counted
      .select(Seq($"grp", $"n") ++ (1 to 9).map(d => col(s"d$d")) ++
        Seq(chi2.as("chi2"), maxDev.as("max_dev")): _*)
      .orderBy($"grp")
  }

  val benfordAuditSql: String = {
    val obs = (1 to 9).map(d =>
      s"CAST(sum(CASE WHEN substr(CAST(CAST(floor(v) AS BIGINT) AS " +
        s"VARCHAR), 1, 1) = '$d' THEN 1 ELSE 0 END) AS BIGINT) AS d$d")
      .mkString(",\n       |         ")
    val chi2 = "CAST(" + (1 to 9).map { d =>
      val e = s"(CAST(n AS DOUBLE) * ${P(d - 1)})"
      s"CAST(floor((CAST(d$d AS DOUBLE) - $e) * (CAST(d$d AS DOUBLE)" +
        s" - $e) / $e * 1e6) AS BIGINT)"
    }.mkString("\n       |         + ") + " AS DOUBLE) / 1e6"
    // same left fold as the Scala reduce: greatest(greatest(a, b), c)…
    // (max is exact selection, but keeping the shapes identical means
    // nothing has to be argued)
    val maxDev = (1 to 9).map { d =>
      s"abs(CAST(d$d AS DOUBLE) / CAST(n AS DOUBLE) - ${P(d - 1)})"
    }.reduce((a, b) => s"greatest($a, $b)")
    s"""WITH c AS (
       |  SELECT o_orderpriority AS grp, o_totalprice AS v FROM orders
       |  WHERE o_totalprice >= 1),
       |a AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
       |         $obs
       |  FROM c GROUP BY grp)
       |SELECT grp, n, d1, d2, d3, d4, d5, d6, d7, d8, d9,
       |       $chi2
       |         AS chi2,
       |       $maxDev AS max_dev
       |FROM a
       |ORDER BY grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x155_benford_audit" -> benfordAudit _)

  val oracles: Map[String, String] = Map(
    "x155_benford_audit" -> benfordAuditSql)
}
