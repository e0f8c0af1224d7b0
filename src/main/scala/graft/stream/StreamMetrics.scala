package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X88 — streaming per-key metrics maintenance: the X86 refresh run
  * CONTINUOUSLY. The per-(user, event_type) metrics table (count /
  * exact decimal total / mean / max) is a streaming groupBy aggregate:
  * the state store holds exactly the base partials X86 persists to
  * parquet, and every micro-batch is the delta whose partials merge in
  * by the same associativity law the batch oracle proves lossless —
  * count and decimal sums add, max composes, the mean derives from
  * exact operands at emit time. Stream-vs-batch equality across
  * micro-batch boundaries is pinned in StreamMetricsSpec, plus the
  * state-rows == |keys| property (state is the KEYED summary, never an
  * event buffer — the same discipline as X23/X41).
  *
  * At scale: state size is |keys| × 4 longs-ish regardless of stream
  * length; the per-trigger work is the micro-batch's partial aggregate
  * plus a state-store merge keyed on (user, event_type) — the same
  * two-phase shape as the batch plan, with the base scan replaced by
  * the state store. Update output mode emits only touched keys per
  * trigger (the production sink shape); Complete mode re-emits the
  * whole table (used by the spec's memory sink).
  */
object StreamMetrics {

  /** Keyed metrics over a (streaming or batch) events frame with
    * (user_id, event_type, value) columns.
    */
  def keyedMetrics(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // the aggregate IS x86's partial definition (one shared builder,
    // so the state == base-partials claim can't silently drift)
    graft.ops.IncrementalAgg.partialsOf(events)
      .select($"user_id", $"event_type", $"cnt".as("n_events"),
        $"tot".cast("double").as("total_q"),
        ($"tot".cast("double") / $"cnt".cast("double")).as("avg_q"),
        $"mx".as("max_value"))
  }
}
