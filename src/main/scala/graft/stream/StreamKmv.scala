package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, KmvSketch}
import graft.ops.Kmv

/** X139 (streaming half) — per-source KMV distinct-content sketches
  * maintained INCREMENTALLY over an unbounded document stream: the
  * [[graft.functions.KmvSketch]] bounded aggregator dropped into a
  * streaming groupBy in complete mode. Each micro-batch folds its rows
  * into ≤K-slot partial buffers, the state store holds exactly ONE
  * bounded row per source (never per document, never per distinct
  * content — dedup happens inside the aggregator, which is why the
  * plan needs no upstream `distinct` and no unbounded state), and
  * every trigger emits the sketch-so-far. The bottom-k union law
  * (X135/X138) makes the incremental result independent of how the
  * stream was sliced into batches — StreamKmvSpec pins streamed ≡
  * batch across a micro-batch boundary and the per-source state bound.
  *
  * The streaming analog of X47's CMS maintenance, for the cardinality
  * family: a day's distinct-content view at K longs per source.
  */
object StreamKmv {

  /** Per-source KMV sketch over a (streaming or batch) documents frame
    * with `source` and `text` columns. Emits (source, ks, k_used,
    * kth_hash, est_q) — est from the sketch alone (no exact audit: a
    * stream has no countDistinct to lean on; below capacity the sketch
    * IS the distinct set, so k_used < K ⟹ est is exact).
    */
  def sourceKmv(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kmv = udaf(new KmvSketch(Kmv.K))
    docs
      .select($"source", Hashing.md5Long40($"text").as("h"))
      .groupBy($"source")
      .agg(kmv($"h").as("ks"))
      .select($"source", $"ks",
        size($"ks").cast("long").as("k_used"),
        element_at($"ks", size($"ks")).as("kth_hash"))
      .withColumn("est_q",
        when($"k_used" < Kmv.K, $"k_used".cast("double"))
          .otherwise((lit((Kmv.K - 1).toDouble) *
            lit((1L << 40).toDouble)) / $"kth_hash".cast("double")))
  }
}
