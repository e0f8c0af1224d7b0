package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.ops.Cusum

/** X111 — streaming CUSUM drift maintenance: the continuous form of the
  * batch X94 chart. Where the batch op computes S_t = max(0, S_{t−1} +
  * (cnt_t − K)) for every user-day via the closed prefix identity
  * (windows), the stream maintains the SAME chart by the direct
  * recursion in per-user keyed state, emitting one chart row per day
  * the moment the day provably closes — an abuse/ingestion-drift alarm
  * with bounded latency instead of a nightly batch.
  *
  * Design, in Spark streaming terms:
  *  - flatMapGroupsWithState + EventTimeTimeout (the X101 discipline):
  *    a day closes IN-BAND when a later-day event arrives, or
  *    OUT-OF-BAND when the event-time watermark passes its end —
  *    without the timeout the last open day per user would dangle
  *    forever;
  *  - silent days between activity decay the chart by K each and emit
  *    their rows when the next event (or timeout-then-event) reveals
  *    them — the batch spine's silent-day semantics, reproduced lazily;
  *  - state per user is O(1): the chart value through the last closed
  *    day plus the one open day's count — the CUSUM recursion is
  *    Markov, which is exactly why the streaming form is cheap (no
  *    buffered events, unlike X101's open-session buffer);
  *  - after a timeout close the (lastDay, s) pair stays in state so a
  *    user's later return decays through the silent gap correctly
  *    (dropping state would restart the chart at 0 — the X101
  *    tombstone lesson); production evicts with a state TTL;
  *  - semantics ≡ batch X94's chart over each user's active span for
  *    event-time-ordered arrival, pinned in StreamCusumSpec against
  *    [[Cusum.dailyChartOf]] on the real corpus with the stream split
  *    mid-corpus and terminally watermark-flushed. Late (out-of-order)
  *    events fold into the currently open day — the documented
  *    approximation outside the parity contract, bounded by the
  *    deployment's watermark delay.
  */
object StreamCusum {

  /** One emitted chart row — the streaming twin of a dailyChartOf row. */
  final case class ChartOut(user_id: Long, day: java.sql.Date,
      cnt: Long, cusum: Long, flagged: Boolean)

  /** Per-user chart state: last CLOSED epoch day + chart value through
    * it (`started` false until the first close), and the open day.
    */
  final case class CusumState(lastDay: Long, s: Long, started: Boolean,
      openDay: Long, openCnt: Long, hasOpen: Boolean)

  private val MsPerDay = 86400000L

  private def epochDay(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, MsPerDay)

  private def date(day: Long): java.sql.Date =
    new java.sql.Date(day * MsPerDay)

  def chartRows(events: DataFrame,
      k: Long = Cusum.K, h: Long = Cusum.H): Dataset[ChartOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[CusumState, ChartOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user, rows, state: GroupState[CusumState]) =>
          val out = List.newBuilder[ChartOut]
          var st = state.getOption.getOrElse(
            CusumState(0L, 0L, started = false, 0L, 0L, hasOpen = false))

          def closeOpen(): Unit = if (st.hasOpen) {
            val s1 = math.max(0L, st.s + st.openCnt - k)
            out += ChartOut(user, date(st.openDay), st.openCnt, s1, s1 >= h)
            st = CusumState(st.openDay, s1, started = true, 0L, 0L,
              hasOpen = false)
          }

          // decay + emit the silent days (exclusive) up to `until`
          def decayTo(until: Long): Unit = if (st.started) {
            var d = st.lastDay + 1
            var s = st.s
            while (d < until) {
              s = math.max(0L, s - k)
              out += ChartOut(user, date(d), 0L, s, s >= h)
              d += 1
            }
            st = st.copy(lastDay = math.max(st.lastDay, until - 1), s = s)
          }

          if (state.hasTimedOut) {
            closeOpen()
            state.update(st) // keep (lastDay, s): later returns decay through the gap
          } else {
            // the shuffle behind groupByKey does not preserve event order
            // within a group — sort the micro-batch's rows by event time
            // (the StreamSessions discipline) so the recursion sees days
            // in order regardless of partitioning
            rows.toSeq.sortBy(_._2.getTime).foreach { case (_, ts) =>
              val d = epochDay(ts)
              if (st.hasOpen) {
                if (d <= st.openDay) {
                  // same-day, or late past the watermark: fold into the
                  // open day (documented approximation)
                  st = st.copy(openCnt = st.openCnt + 1)
                } else {
                  closeOpen()
                  decayTo(d)
                  st = st.copy(openDay = d, openCnt = 1L, hasOpen = true)
                }
              } else {
                if (st.started && d <= st.lastDay) {
                  // late event for an already-closed day: re-open the
                  // current frontier is impossible in append mode —
                  // fold forward into a fresh open day at the frontier
                  st = st.copy(openDay = st.lastDay + 1, openCnt = 1L,
                    hasOpen = true)
                } else {
                  decayTo(d)
                  st = st.copy(openDay = d, openCnt = 1L, hasOpen = true)
                }
              }
            }
            state.update(st)
            if (st.hasOpen)
              // end of the open day; clamped above the current watermark
              // (a cross-user-late batch can arrive with the watermark
              // already past this user's day end — the close then rides
              // the next watermark advance)
              state.setTimeoutTimestamp(
                math.max((st.openDay + 1) * MsPerDay,
                  state.getCurrentWatermarkMs() + 1))
          }
          out.result().iterator
      }
  }
}
