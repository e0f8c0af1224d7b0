package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** X57 — stream-static enrichment join + anomaly flagging: an unbounded
  * event stream joined against a STATIC (batch-computed) per-type fence
  * table — the X55 winsorization fences — flagging every event outside
  * its type's [lo, hi] fence as it arrives.
  *
  * The stream-static join is the missing-piece streaming surface next
  * to the watermark aggregations (R18–R22), stream-stream joins
  * (StreamingSpec), and keyed state (X23/X41/X47): dimension enrichment.
  * Spark plans it as a per-micro-batch BROADCAST hash join — the static
  * side is resolved ONCE per batch from the driver-side relation, the
  * stream side never shuffles, and NO state store is involved (the
  * static table is not stream state; there is nothing to water-mark or
  * evict). That property is exactly why production topologies push
  * dimension joins onto the stream instead of key-valued lookups: the
  * join is stateless, so throughput scales with the map stage.
  *
  * The fence frame is any (event_type, lo, hi) table — in production
  * the x55 percentile output refreshed on a batch cadence; specs pass a
  * literal frame. StreamEnrichSpec pins batch == stream row-level
  * parity across micro-batch boundaries, the broadcast (stateless) plan
  * shape, and flag correctness at the fence boundaries (strict
  * outside-ness, nulls never flagged).
  */
object StreamEnrich {

  /** Enrich a (streaming or batch) events frame with static fences and
    * flag out-of-fence values. Null-safe: a type with no fence row (left
    * join miss) is never flagged — unknown types pass through tagged
    * `unfenced` for a downstream triage sink.
    */
  def enrich(events: DataFrame, fences: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .join(broadcast(fences), Seq("event_type"), "left")
      .select(
        $"event_id", $"event_type", $"value", $"lo", $"hi",
        when($"lo".isNull, lit("unfenced"))
          .when($"value" < $"lo", lit("below"))
          .when($"value" > $"hi", lit("above"))
          .otherwise(lit("ok")).as("flag"))
  }
}
