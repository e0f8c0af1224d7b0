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

  /** Exact-sum-based mean of a double column, returned as double. */
  def davg(c: Column): Column =
    sum(c.cast("decimal(27,6)")).cast("double") / count(c)

  /** SQL fragments mirroring the above for the DuckDB oracle. */
  def sqlSum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(27,6))) AS DOUBLE) / count($expr)"
}
