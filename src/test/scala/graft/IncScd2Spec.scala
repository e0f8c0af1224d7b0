package graft

import java.sql.Timestamp

import graft.ops.{IncScd2, Relational}

/** B58 — incremental SCD2 maintenance: hand-traced merge fixtures for
  * every state transition (extend, close, new customer, untouched), and
  * the incremental ≡ full-recompute equality on the real orders — the
  * same property the DuckDB oracle gate proves.
  */
class IncScd2Spec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s + " 00:00:00")

  private def ordersOf(rows: (Long, Long, String, String)*) =
    rows.map { case (ck, ok, d, p) => (ck, ok, ts(d), p) }
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority")

  private def histOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("o_custkey"),
      r.getAs[Long]("version"), r.getAs[String]("o_orderpriority"),
      r.getAs[Timestamp]("valid_from"), r.getAs[Timestamp]("valid_to"),
      r.getAs[Long]("n_orders"))).toSet

  test("B58: extend, close, new-customer, and untouched all merge right") {
    // cust 1: open version extends (same priority) then closes (change)
    // cust 2: untouched by the delta — rows must pass through
    // cust 3: brand new in the delta — cold B37 numbering from 1
    val orders = ordersOf(
      (1L, 10L, "2024-01-01", "HIGH"), (1L, 11L, "2024-01-05", "HIGH"),
      (2L, 20L, "2024-01-02", "LOW"), (2L, 21L, "2024-01-03", "MED"),
      (1L, 12L, "2024-02-02", "HIGH"),   // delta: extends v1
      (1L, 13L, "2024-02-07", "LOW"),    // delta: closes v1, opens v2
      (3L, 30L, "2024-02-03", "MED"))    // delta: new customer
    val cutoff = org.apache.spark.sql.functions.lit("2024-02-01")
      .cast("timestamp")
    val got = histOf(IncScd2.incrementalScd2Of(orders, cutoff))
    val full = histOf(Relational.scd2IntervalsOf(orders))
    assert(got == full)
    // spot-check the hand trace
    assert(got.contains((1L, 1L, "HIGH",
      ts("2024-01-01"), ts("2024-02-07"), 3L)))
    assert(got.contains((1L, 2L, "LOW", ts("2024-02-07"), null, 1L)))
    assert(got.contains((2L, 2L, "MED", ts("2024-01-03"), null, 1L)))
    assert(got.contains((3L, 1L, "MED", ts("2024-02-03"), null, 1L)))
  }

  test("B58: an un-extended open version is closed by the first delta version") {
    val orders = ordersOf(
      (5L, 50L, "2024-01-01", "HIGH"),
      (5L, 51L, "2024-02-02", "LOW"),   // delta: immediate change
      (5L, 52L, "2024-02-05", "LOW"))
    val cutoff = org.apache.spark.sql.functions.lit("2024-02-01")
      .cast("timestamp")
    val got = histOf(IncScd2.incrementalScd2Of(orders, cutoff))
    assert(got == Set(
      (5L, 1L, "HIGH", ts("2024-01-01"), ts("2024-02-02"), 1L),
      (5L, 2L, "LOW", ts("2024-02-02"), null, 2L)))
  }

  test("B58: real orders — merge equals the full B37 recompute") {
    val full = histOf(Tables.orders(spark, sfDir)
      .transform(Relational.scd2IntervalsOf))
    val inc = histOf(IncScd2.incrementalScd2Of(
      Tables.orders(spark, sfDir),
      org.apache.spark.sql.functions.lit(IncScd2.Cutoff).cast("timestamp")))
    assert(inc == full)
    // the split is non-trivial at this SF: both sides of the cutoff hold rows
    val n = Tables.orders(spark, sfDir)
      .filter($"o_orderdate" >= org.apache.spark.sql.functions
        .lit(IncScd2.Cutoff).cast("timestamp")).count()
    assert(n > 0 && n < Tables.orders(spark, sfDir).count())
  }
}
