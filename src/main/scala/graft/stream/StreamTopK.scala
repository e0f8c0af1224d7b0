package graft.stream

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X119 — streaming heavy hitters by SPACE-SAVING (Metwally et al.
  * 2005): the top-frequency view of an unbounded keyed stream in O(k)
  * state per shard, with per-key error bounds — the streaming
  * counterpart of the exact batch top-k family (X37 heavy hitters,
  * B56 grouped top-k) the way X47's CMS is the streaming counterpart
  * of X45 (CMS answers point frequency; space-saving answers WHICH
  * keys are frequent, which a sketch alone cannot enumerate).
  *
  * The algorithm per shard (k counters, each (key → cnt, err)):
  * a seen key increments; an unseen key with room inserts (1, 0); an
  * unseen key without room evicts the minimum counter m and inserts
  * (m.cnt + 1, m.cnt). Invariants this buys (all pinned in
  * StreamTopKSpec): Σcnt == items processed; for any tracked key
  * cnt − err ≤ true_freq ≤ cnt; any key with true_freq > n/k is
  * guaranteed tracked. Eviction ties break by (cnt, key) — a total
  * order, so the summary is a pure function of the arrival sequence.
  *
  * Design, in Spark streaming terms:
  *  - mapGroupsWithState keyed by hash SHARD (S groups), not by key —
  *    keying by key would make state O(|keys|), which is exactly what
  *    space-saving exists to avoid; S shards parallelize the fold and
  *    bound per-task state at k counters each. A reader merges shard
  *    summaries for the global view (union of summaries; the bounds
  *    add). At 1000 executors S scales with the cluster, not the data.
  *  - the micro-batch's rows fold in (ts, event_id) order (the
  *    StreamCusum discipline: the groupByKey shuffle does not preserve
  *    order, and space-saving is order-sensitive, so parity with the
  *    batch replay needs a declared total order);
  *  - each trigger emits the shard's full k-row summary stamped with a
  *    generation counter (update-mode semantics through an append-only
  *    test sink: consumers keep the max generation per shard);
  *  - state per shard is exactly the k counters — no event buffer, no
  *    timeout needed (the summary never expires; production would
  *    window the stream upstream for a daily view).
  *
  * Stream ≡ one-shot batch fold of the same arrival sequence is pinned
  * across micro-batch boundaries in StreamTopKSpec via the shared
  * [[StreamTopK.fold]] seam on the real corpus.
  */
object StreamTopK {

  /** Shards and counters-per-shard (see scale note above). */
  val Shards = 8
  val K = 16

  /** One summary row: shard, generation, tracked key, count, error. */
  final case class TopKOut(shard: Int, gen: Long, user_id: Long,
      cnt: Long, err: Long)

  /** Shard state: generation + the counter table. */
  final case class TopKState(gen: Long, counters: Map[Long, (Long, Long)])

  /** Deterministic shard of a key (spec-fixed Long hash, positive mod). */
  def shardOf(key: Long): Int =
    ((key ^ (key >>> 32)).toInt % Shards + Shards) % Shards

  /** The space-saving fold — pure, shared by the stream op and the
    * spec's batch replay. Items must arrive in the declared order.
    */
  def fold(counters: Map[Long, (Long, Long)], items: Seq[Long],
      k: Int = K): Map[Long, (Long, Long)] =
    items.foldLeft(counters) { (c, key) =>
      c.get(key) match {
        case Some((cnt, err)) => c.updated(key, (cnt + 1, err))
        case None if c.size < k => c.updated(key, (1L, 0L))
        case None =>
          val (mKey, (mCnt, _)) = c.minBy { case (kk, (cc, _)) => (cc, kk) }
          (c - mKey).updated(key, (mCnt + 1, mCnt))
      }
    }

  /** Space-saving summaries over a (streaming or batch) events frame
    * with (user_id, ts, event_id) columns.
    */
  def userTopK(events: DataFrame): Dataset[TopKOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .selectExpr("user_id", "ts", "event_id")
      .as[(Long, Timestamp, Long)]
      .groupByKey(r => shardOf(r._1))
      .mapGroupsWithState[TopKState, Seq[TopKOut]](
        GroupStateTimeout.NoTimeout()) {
        (shard, rows, state: GroupState[TopKState]) =>
          val st = state.getOption.getOrElse(TopKState(0L, Map.empty))
          val ordered = rows.toSeq
            .sortBy(r => (r._2.getTime, r._3)).map(_._1)
          val next = TopKState(st.gen + 1, fold(st.counters, ordered))
          state.update(next)
          next.counters.toSeq.sortBy(_._1).map { case (key, (cnt, err)) =>
            TopKOut(shard, next.gen, key, cnt, err)
          }
      }
      .flatMap(identity)
  }
}
