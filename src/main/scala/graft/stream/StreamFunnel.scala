package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Funnel

/** X41 — streaming funnel: the continuous complement of the batch X38
  * funnel. As events arrive, per-user keyed state tracks which funnel
  * stage the user has reached, and a stage-completion record is emitted
  * the moment a stage first completes — possibly many micro-batches
  * after the previous stage. A product surface consumes the completion
  * stream directly (live conversion dashboards, triggered messaging)
  * instead of re-running the batch funnel per refresh.
  *
  * Design, in Spark streaming terms:
  *  - per-user state via flatMapGroupsWithState — genuinely imperative
  *    keyed state (the documented last-resort case): "first qualifying
  *    event after a prior stage, within its window" is a cross-event
  *    dependency no incremental built-in expresses;
  *  - state is three optional i64 timestamps per user — constant-size,
  *    never a buffer of events, so a hot user costs the same as a cold
  *    one (contrast buffering approaches that replay a user's history);
  *  - semantics are EXACTLY the batch definition ([[Funnel.stageTimes]])
  *    for event-time-ordered arrival per user; StreamFunnelSpec pins
  *    stream completions == batch stage times on the real corpus with a
  *    conversion straddling micro-batches. Out-of-order arrival is the
  *    deployment's watermark/reorder-buffer concern (as with X23);
  *  - at 100 TB-scale ingest the same topology runs with RocksDB state
  *    and a state TTL (GroupStateTimeout) evicting users whose step
  *    window has lapsed — the timeout hook is where that policy lands.
  */
object StreamFunnel {

  /** Per-user funnel state: completion micros per stage (None = not yet). */
  final case class FunnelState(t1: Option[Long], t2: Option[Long], t3: Option[Long])

  /** One emitted stage completion. */
  final case class StageHit(user_id: Long, stage: String, ts: Timestamp)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  /** The streaming operator over a (user_id, ts, event_type, event_id)
    * frame (streaming or batch): stage completions in event order.
    */
  def stageCompletions(events: DataFrame,
      stepHours: Int = Funnel.StepHours): Dataset[StageHit] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stepMicros = stepHours * 3600L * 1000000L
    events
      .selectExpr("user_id", "ts", "event_type", "event_id")
      .as[(Long, Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, StageHit](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(None, None, None))
          val out = List.newBuilder[StageHit]
          // deterministic within a micro-batch: event-time order, ties by
          // event_id — the batch window's exact ordering
          rows.toSeq.sortBy(r => (micros(r._2), r._4)).foreach {
            case (_, ts, tpe, _) =>
              val us = micros(ts)
              if (tpe == "view" && st.t1.isEmpty) {
                st = st.copy(t1 = Some(us))
                out += StageHit(user, "1_view", ts)
              } else if (tpe == "click" && st.t2.isEmpty &&
                  st.t1.exists(t1 => us > t1 && us <= t1 + stepMicros)) {
                st = st.copy(t2 = Some(us))
                out += StageHit(user, "2_click", ts)
              } else if (tpe == "purchase" && st.t3.isEmpty &&
                  st.t2.exists(t2 => us > t2 && us <= t2 + stepMicros)) {
                st = st.copy(t3 = Some(us))
                out += StageHit(user, "3_purchase", ts)
              }
          }
          state.update(st)
          out.result().iterator
      }
  }
}
