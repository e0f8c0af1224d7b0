package graft

import org.apache.spark.sql.functions._

import graft.ops.Events

/** Events-table operator semantics the oracle can't see: the
  * pivot↔unpivot round trip and session/window shape checks.
  */
class EventsSpec extends SparkSpec {

  test("B27: unpivot(pivot(x)) recovers the long-form counts") {
    import spark.implicits._
    val types = Seq("click", "error", "purchase", "signup", "view")
    val wide = Events.pivotEventCounts(spark, sfDir)
    val long = wide.unpivot(
      Array($"user_id"), types.map(col).toArray, "event_type", "n")
      .filter($"n" > 0) // zero-fill rows have no long-form counterpart
    val expected = Tables.events(spark, sfDir)
      .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
    assert(long.select("user_id", "event_type", "n")
      .exceptAll(expected).isEmpty)
    assert(expected.exceptAll(
      long.select("user_id", "event_type", "n")).isEmpty)
  }

  test("X9 and B22 agree on session boundaries (gap form vs session_window)") {
    val x9 = Events.sessionize(spark, sfDir)
      .select("user_id", "session_start", "n_events")
    val b22 = Events.sessionWindow(spark, sfDir)
      .select("user_id", "session_start", "n_events")
    assert(x9.exceptAll(b22).isEmpty && b22.exceptAll(x9).isEmpty,
      "lag+cumsum islands and session_window must produce identical sessions")
  }
}
