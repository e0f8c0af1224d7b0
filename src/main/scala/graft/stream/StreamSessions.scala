package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.SeqAssembly

/** X101 — streaming session assembly: the continuous form of the batch
  * X93 operator. As events arrive, per-user keyed state buffers the
  * OPEN session; the moment a ≥30-minute silence is observed — either
  * because a later event arrives past the gap, or because the event-time
  * watermark passes the open session's gap horizon — the completed
  * session is emitted as ONE ordered training sample (the `>`-joined
  * event-type sequence plus size stats). An ingestion pipeline gets
  * training-ready conversation transcripts with bounded latency instead
  * of re-running the batch assembly per refresh.
  *
  * Design, in Spark streaming terms:
  *  - flatMapGroupsWithState with EventTimeTimeout — the session close
  *    has TWO triggers and only keyed state expresses both: a
  *    subsequent event proves the gap in-band, and the watermark proves
  *    it out-of-band for a user who simply went quiet (without the
  *    timeout, a user's last session would dangle forever — the classic
  *    leak of gap-based assembly done with state);
  *  - state per user is the OPEN session only: start/last micros plus
  *    the event-type buffer, bounded by session length exactly as the
  *    batch aggregation state is (the gap bounds it in wall time);
  *    closed sessions leave state immediately;
  *  - semantics are EXACTLY the batch definition ([[SeqAssembly]])
  *    for event-time-ordered arrival per user: same boundary rule
  *    (gap ≥ 30 min opens a new session), same (us, event_id) ordering,
  *    same sequence rendering. StreamSessionsSpec pins stream output ==
  *    batch X93 on the real corpus with sessions straddling
  *    micro-batches, watermark-flushed at the end;
  *  - session_id is the per-user ordinal of the emitted session (1-based
  *    in emission order), matching X93's running-sum numbering because
  *    sessions close in event-time order per user;
  *  - at production scale the same topology runs with RocksDB state;
  *    the watermark delay is the deployment's reorder tolerance (X23's
  *    discipline).
  */
object StreamSessions {

  /** Per-user open-session state: start/last micros and the ordered
    * (us, event_id, event_type) buffer of the open session; `emitted` =
    * sessions already closed for this user (numbers the next one).
    */
  final case class SessionState(startUs: Long, lastUs: Long,
      events: List[(Long, Long, String)], emitted: Long)

  /** One emitted closed session — X93's per-session sample shape. */
  final case class SessionOut(user_id: Long, session_id: Long,
      n_events: Long, n_types: Long, seq: String)

  private def micros(ts: Timestamp): Long =
    ts.getTime / 1000 * 1000000L + ts.getNanos / 1000

  private def render(st: SessionState, sid: Long): SessionOut = {
    val ordered = st.events.sortBy(e => (e._1, e._2))
    SessionOut(0L, sid, ordered.size.toLong,
      ordered.map(_._3).distinct.size.toLong,
      ordered.map(_._3).mkString(">"))
  }

  /** The streaming operator over a (user_id, ts, event_type, event_id)
    * frame (streaming or batch): closed sessions in event order. The
    * final open session per user emits once the watermark passes its
    * gap horizon (streaming) — in batch execution (no watermark) state
    * timeouts never fire, so the last open session per user stays
    * un-emitted; the spec drives the streaming path with a terminal
    * watermark advance to flush it.
    */
  def closedSessions(events: DataFrame,
      gapUs: Long = SeqAssembly.GapUs): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_type", "event_id")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[SessionState]) =>
          val out = List.newBuilder[SessionOut]
          var st = state.getOption.orNull
          if (state.hasTimedOut) {
            // watermark passed the open session's horizon: close it,
            // but KEEP the counter as a tombstone — removing state here
            // would restart this user's session numbering at 1 (found by
            // the cross-micro-batch equality test). Production evicts
            // tombstones with a state TTL policy.
            if (st != null && st.events.nonEmpty) {
              out += render(st, st.emitted + 1).copy(user_id = user)
              state.update(SessionState(0L, 0L, Nil, st.emitted + 1))
            }
            out.result().iterator
          } else {
            rows.toSeq.sortBy(r => (micros(r._2), r._4)).foreach {
              case (_, ts, tpe, eid) =>
                val us = micros(ts)
                if (st == null) {
                  st = SessionState(us, us, List((us, eid, tpe)), 0L)
                } else if (st.events.isEmpty) {
                  // tombstone: no open session, counter carries over
                  st = SessionState(us, us, List((us, eid, tpe)), st.emitted)
                } else if (us - st.lastUs >= gapUs) {
                  out += render(st, st.emitted + 1).copy(user_id = user)
                  st = SessionState(us, us, List((us, eid, tpe)),
                    st.emitted + 1)
                } else {
                  st = st.copy(lastUs = math.max(st.lastUs, us),
                    events = (us, eid, tpe) :: st.events)
                }
            }
            if (st != null) {
              state.update(st)
              if (st.events.nonEmpty)
                // close when the watermark proves the gap with no new event
                state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000L)
            }
            out.result().iterator
          }
      }
  }
}
