package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.VectorSumQ
import graft.functions.Hashing.{cosQ, dotQ}
import graft.ops.Centroids

/** X162 — streaming centroid maintenance: per-label class centroids
  * kept incrementally over an unbounded embedding stream, with each
  * trigger emitting the live centroid and its drift (quantized L2² +
  * cosine) against a pinned reference centroid — X160's cross-batch
  * stability audit with the "current batch" side replaced by the
  * stream-so-far (the live encoder-regression alarm; the nightly X160
  * batch run stays the exact word on completed batches). Closes the
  * streaming form of the centroid family the way X161 closed the
  * linear-sketch pair: the state is [[graft.functions.VectorSumQ]]'s
  * `[n, s₀…s_{D−1}]` buffer — ONE bounded row per label — and i64
  * linearity makes streamed ≡ batch BIT-equal under any micro-batch
  * slicing.
  *
  * Exactness: inputs are pre-quantized per-dim i64 (X36's floor(v·1e6)
  * — row-local transform, no float ever enters the state); the live
  * centroid is CAST(s AS DOUBLE)/n/scale (X36's exact chain); drift is
  * X160's three-dotQ fixed-order decomposition against the reference
  * array. All computed ROW-LOCALLY from the one state row.
  *
  * Reference scope: no embedding analytics in the reference; engine
  * extension (SURVEY §2.5, the X36/X160 centroid family's streaming
  * closure).
  */
object StreamCentroid {

  /** The pinned reference: per-label centroid arrays of a reference
    * corpus — X36's mean chain over any (label, embedding) frame. */
  def refCentroids(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    graft.ops.Assign.centroidArrays(
      e.select($"label", $"embedding"))
      .select($"c_label".as("label"), $"c".as("rc"))
  }

  /** Per-label live centroid + drift vs the static reference, over a
    * (streaming or batch) (label, embedding) frame.
    *
    * The reference is joined LEFT from the live side (round-13 advice
    * item): a label the calibration never saw must still emit its live
    * row — flagged has_ref=false with NULL drift columns (no reference
    * centroid, no drift; the flag is the alarm).
    */
  def centroidMonitor(e: DataFrame, ref: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val vs = udaf(new VectorSumQ, ExpressionEncoder[Array[Long]]())
    e.select($"label",
        transform($"embedding", v =>
          floor(v.cast("double") * Centroids.Scale).cast("long")).as("q"))
      .groupBy($"label")
      .agg(vs($"q").as("b"))
      .select($"label",
        element_at($"b", 1).as("n_vecs"),
        expr("transform(slice(b, 2, size(b) - 1), s -> " +
          s"CAST(CAST(s AS DOUBLE) / element_at(b, 1) " +
          s"/ ${Centroids.Scale} AS FLOAT))").as("c"))
      .join(ref, Seq("label"), "left")
      .withColumn("has_ref", $"rc".isNotNull)
      .select($"label", $"n_vecs", $"has_ref",
        // dotQ quantizes per-term at 1e15 — divide back to real units
        when($"has_ref",
          (dotQ($"c", $"c") - lit(2.0) * dotQ($"c", $"rc")
            + dotQ($"rc", $"rc")) / lit(1e15))
          .otherwise(lit(null)).cast("double").as("l2sq_drift"),
        when($"has_ref",
          cosQ(dotQ($"c", $"rc"), dotQ($"c", $"c"), dotQ($"rc", $"rc")))
          .otherwise(lit(null)).cast("double").as("cos_ref"))
  }
}
