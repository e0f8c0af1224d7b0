package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.IncrementalAgg

/** X86 — incremental aggregate maintenance: crafted base/delta/merged
  * fixture with hand-computed rows, and in-engine equality between the
  * merge-of-partials path and a flat from-scratch recompute on the real
  * events table (the DuckDB oracle re-proves the same from outside).
  */
class IncrementalAggSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("X86: base-only, delta-only, and merged keys come out exact") {
    val cutoff = ts("2024-01-24 00:00:00")
    val events = Seq(
      // user 1 click: base only
      (1L, "click", 1.25, ts("2024-01-02 00:00:00")),
      (1L, "click", 2.75, ts("2024-01-03 00:00:00")),
      // user 1 view: straddles the cutoff -> merged
      (1L, "view", 10.00, ts("2024-01-10 00:00:00")),
      (1L, "view", 30.00, ts("2024-01-25 00:00:00")),
      // user 2 click: delta only
      (2L, "click", 7.50, ts("2024-01-28 00:00:00")))
      .toDF("user_id", "event_type", "value", "ts")
    val got = IncrementalAgg.incrementalAggOf(events, lit(cutoff)).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[Long]("n_events"), r.getAs[Double]("total_q"),
        r.getAs[Double]("avg_q"), r.getAs[Double]("max_value"),
        r.getAs[String]("origin")))
    assert(got.toSeq == Seq(
      (1L, "click", 2L, 4.0, 2.0, 2.75, "base_only"),
      (1L, "view", 2L, 40.0, 20.0, 30.00, "merged"),
      (2L, "click", 1L, 7.5, 7.5, 7.50, "delta_only")))
  }

  test("X86: a NULL ts routes to the delta side instead of vanishing") {
    val cutoff = ts("2024-01-24 00:00:00")
    val events = Seq(
      (1L, "click", 1.00, Some(ts("2024-01-02 00:00:00"))),
      (1L, "click", 3.00, None: Option[Timestamp]))
      .toDF("user_id", "event_type", "value", "ts")
    val got = IncrementalAgg.incrementalAggOf(events, lit(cutoff)).collect()
    assert(got.length == 1)
    val r = got.head
    // both rows counted (the null-ts one as delta), so the key merges
    assert(r.getAs[Long]("n_events") == 2L &&
      r.getAs[Double]("total_q") == 4.0 &&
      r.getAs[String]("origin") == "merged")
  }

  test("X86: merge of partials equals flat recompute on the real table") {
    val events = Tables.events(spark, sfDir)
    val cutoff = to_timestamp(lit(IncrementalAgg.Cutoff))
    val merged = IncrementalAgg.incrementalAggOf(events, cutoff)
      .drop("origin") // recompute derives origin separately; values first
    val flat = events.groupBy($"user_id", $"event_type")
      .agg(count(lit(1)).as("n_events"),
        sum($"value".cast("decimal(27,6)")).cast("double").as("total_q"),
        (sum($"value".cast("decimal(27,6)")).cast("double")
          / count(lit(1)).cast("double")).as("avg_q"),
        max($"value").as("max_value"))
      .orderBy($"user_id", $"event_type")
    val a = merged.collect().toSeq
    val b = flat.collect().toSeq
    assert(a.length == b.length && a.length > 0)
    // bit-equal row-for-row: counts/totals exact, avg divides the same
    // exact operands on both paths
    assert(a == b, "merge-of-partials diverged from flat recompute")
  }

  test("X86: real corpus exercises all three origins at the cutoff") {
    val origins = IncrementalAgg
      .incrementalAgg(spark, sfDir)
      .groupBy($"origin").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(origins.getOrElse("merged", 0L) > 0, s"no merged keys: $origins")
    assert(origins.keySet.subsetOf(Set("base_only", "delta_only", "merged")))
  }
}
