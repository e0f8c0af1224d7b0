package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable aggregate forms.
  *
  * Double addition is not associative, so `sum(double)` depends on the
  * partition layout and merge order — fine on one run, but the driver
  * hash-compares our results against DuckDB bit-for-bit, and at 100 TB the
  * partition count is never the same twice. Summing through a fixed-scale
  * decimal makes the aggregate exact and therefore order-independent: the
  * only float step left is the final (deterministic) decimal→double cast,
  * which both engines perform on the *same* exact decimal value.
  *
  * Cost note: Spark's decimal sum stays inside whole-stage codegen and
  * map-side partial aggregation; the overhead vs a double sum is a few
  * percent, which is the right trade for a reproducible answer.
  */
object OracleSafe {
  /** Exact order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double")

  /** Cross-engine-deterministic DECIMAL(·,6) → DOUBLE.
    *
    * The "deterministic decimal→double cast" the header paragraph leans
    * on is NOT always the same value in both engines: DuckDB's cast is
    * not correctly rounded (measured at round 14: DECIMAL '27845339640
    * .098010' → …098007, a 2-ulp drift at any declared precision),
    * while Spark converts through BigDecimal's correctly-rounded
    * doubleValue. For sums whose magnitude pushes the 6-decimal
    * granularity below the double ulp (~1e10 and up), the two casts can
    * disagree. This helper recombines from EXACT i64 parts instead:
    * integer part (floor, exact BIGINT both engines) plus micros
    * fraction (exact BIGINT < 1e6), with one correctly-rounded division
    * and one addition sequenced identically — identical operands,
    * identical IEEE results, at any magnitude below 2^53.
    */
  def decQ6ToDouble(d: Column): Column = {
    val ip = floor(d).cast("long")
    val fr = ((d - floor(d)) * lit(1000000)).cast("long")
    ip.cast("double") + fr.cast("double") / lit(1e6)
  }

  /** DuckDB fragment computing the same value as [[decQ6ToDouble]];
    * `e` must be a DECIMAL expression with scale 6. */
  def sqlDecQ6ToDouble(e: String): String =
    s"(CAST(CAST(floor($e) AS BIGINT) AS DOUBLE) + " +
      s"CAST(CAST(($e - floor($e)) * 1000000 AS BIGINT) AS DOUBLE) / 1e6)"

  /** Exact-sum-based mean of a double column, returned as double. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double") / count(c)

  /** Exact-sum-based sample stddev: sqrt((Σv² − (Σv)²/n)/(n−1)) with both
    * sums decimal-exact, so the result is order-independent — unlike the
    * built-in stddev_samp, whose running double sums shift with partition
    * count (a round(…,4) guard on it can still flip at .00005 boundaries).
    * Inputs with ≤3 decimal digits make v² exact at scale 6, so the
    * decimal cast loses nothing. n ≤ 1 → null (stddev_samp semantics);
    * greatest(…, 0) guards the sqrt against −0.0-scale cancellation.
    */
  def dstddev(c: Column): Column = {
    val s = sum(c.cast("decimal(27,6)")).cast("double")
    val q = sum((c * c).cast("decimal(27,6)")).cast("double")
    val n = count(c)
    when(n > 1,
      sqrt(greatest((q - s * s / n) / (n - lit(1)), lit(0.0))))
  }

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlSum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,6))) AS DOUBLE) / count($expr)"
  def sqlStddev(expr: String): String =
    s"CASE WHEN count($expr) > 1 THEN sqrt(greatest(" +
      s"(${sqlSum(s"($expr) * ($expr)")} - ${sqlSum(expr)} * ${sqlSum(expr)} / count($expr))" +
      s" / (count($expr) - 1), 0.0)) END"
}
