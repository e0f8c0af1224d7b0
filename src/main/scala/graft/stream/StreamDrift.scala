package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.SampleSketch
import graft.functions.Hashing.md5Long40
import graft.ops.QuantileSketch

/** X152 — streaming distribution-drift monitor: per source, the KS and
  * Wasserstein-1 distance between the live stream's document-length
  * distribution and a pinned REFERENCE distribution, maintained
  * incrementally over an unbounded stream — the "did this feed's shape
  * change since we calibrated?" alarm a production ingestion pipeline
  * keeps running between batch audits. This is the X150 pattern applied
  * to the drift family (X117 KS, X141 W₁): the one thing exact
  * streaming cannot afford — the full per-value CDF spine, which grows
  * with distinct values and needs a sort — is replaced by the bounded
  * [[graft.functions.SampleSketch]] reservoir (X144's state), and both
  * drift statistics are computed ROW-LOCALLY from the ≤K-sample arrays
  * (no second aggregation, which a stream could not run anyway). The
  * nightly batch X117/X141 run stays the exact word.
  *
  * Exactness of the estimate itself: the empirical-CDF distances
  * between the two SAMPLES are computed with cleared denominators —
  * every comparison is |cnt_cur(≤t)·n_ref − cnt_ref(≤t)·n_cur| over the
  * union value spine, integers end to end, divided once at the end —
  * so streamed ≡ batch-on-the-same-sample is BIT-equal (the bottom-k
  * union law makes the reservoir independent of micro-batch slicing),
  * and below sketch capacity the sample IS the data, making ks_q/w1_q
  * exactly X117/X141's statistics against the reference.
  *
  * Scale shape: state is ONE bounded row per source (≤K [h,id,v]
  * triples); each trigger folds the micro-batch into partial buffers
  * map-side; the reference is a static |sources|-row frame joined
  * stream-static (stateless); the spine math is O(K²) integer work per
  * source per trigger — constants, not corpus.
  *
  * Reference scope: the reference computes windowed aggregates on a
  * stream (spark_processor.py:147-166) but has no drift monitoring;
  * engine extension (SURVEY §2.5, the X117/X141/X144/X150 family).
  */
object StreamDrift {

  val K = QuantileSketch.K

  /** The pinned reference: per-source sorted length-sample arrays,
    * built by the SAME sketch at the same K over a reference corpus
    * (batch — run once at calibration time, stored). */
  def refSamples(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sk = udaf(new SampleSketch(K),
      ExpressionEncoder[(Long, Long, Long)]())
    docs
      .select($"source",
        md5Long40(concat($"doc_id".cast("string"), lit(":qs"))).as("h"),
        $"doc_id".as("id"), $"n_chars".as("v"))
      .groupBy($"source")
      .agg(sk($"h", $"id", $"v").as("ks"))
      .select($"source",
        expr("array_sort(transform(ks, x -> x._2))").as("ref"))
  }

  /** Per-source drift of the live stream vs the static reference.
    * Emits (source, n_cur, n_ref, has_ref, ks_q, w1_q): ks_q = max CDF
    * gap in [0,1], w1_q = earth-mover distance in value units —
    * X117/X141's statistics over the two samples. Works identically on
    * a batch frame (the spec's streamed ≡ batch law).
    *
    * The reference is joined LEFT from the live side (round-13 advice
    * item): a source the calibration never saw — the strongest drift
    * signal a monitor exists to catch — must ALARM, not silently drop
    * out of the output the way a stream-static inner join would drop
    * it. No-reference rows emit the explicit convention has_ref=false,
    * n_ref=0, ks_q=1.0 (a novel feed is maximal drift by definition),
    * w1_q=0.0 (transport distance to an empty sample has no value
    * scale — the has_ref flag, not a fake magnitude, is the signal).
    */
  def driftMonitor(docs: DataFrame, ref: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sk = udaf(new SampleSketch(K),
      ExpressionEncoder[(Long, Long, Long)]())
    // cleared-denominator CDF distances over the union spine: at spine
    // point t the scaled gap is |cnt_cur(≤t)·n_ref − cnt_ref(≤t)·n_cur|
    // (integers; ≤ K² ≈ 2²⁶ per product — no overflow). KS takes the
    // max; W₁ weights each gap by the distance to the next spine point.
    val gapAt = "abs(size(filter(cur, x -> x <= t)) * n_ref" +
      " - size(filter(ref, x -> x <= t)) * n_cur)"
    docs
      .select($"source",
        md5Long40(concat($"doc_id".cast("string"), lit(":qs"))).as("h"),
        $"doc_id".as("id"), $"n_chars".as("v"))
      .groupBy($"source")
      .agg(sk($"h", $"id", $"v").as("ks"))
      .select($"source",
        expr("array_sort(transform(ks, x -> x._2))").as("cur"))
      .join(ref, Seq("source"), "left")
      .withColumn("has_ref", $"ref".isNotNull)
      .withColumn("ref",
        coalesce($"ref", array().cast("array<bigint>")))
      .withColumn("n_cur", size($"cur").cast("long"))
      .withColumn("n_ref", size($"ref").cast("long"))
      .withColumn("spine", expr("array_sort(array_union(cur, ref))"))
      .withColumn("ks_num", expr(
        s"aggregate(spine, 0L, (acc, t) -> greatest(acc, $gapAt))"))
      // guard the single-point spine: sequence(1, 0) DESCENDS in Spark
      // ([1, 0]), which would index the spine at 0 — and a one-value
      // spine means both samples are the same point mass (W₁ = 0)
      .withColumn("w1_num", expr(
        "CASE WHEN size(spine) < 2 THEN 0L ELSE " +
          "aggregate(sequence(1, size(spine) - 1), 0L, (acc, i) -> acc" +
          " + (element_at(spine, i + 1) - element_at(spine, i))" +
          s" * ${gapAt.replace("x <= t", "x <= element_at(spine, i)")})" +
          " END"))
      .select($"source", $"n_cur", $"n_ref", $"has_ref",
        when(!$"has_ref", lit(1.0)).otherwise(
          when($"n_cur" * $"n_ref" === 0, lit(0.0)).otherwise(
            $"ks_num".cast("double") /
              ($"n_cur" * $"n_ref").cast("double"))).as("ks_q"),
        when(!$"has_ref", lit(0.0)).otherwise(
          when($"n_cur" * $"n_ref" === 0, lit(0.0)).otherwise(
            $"w1_num".cast("double") /
              ($"n_cur" * $"n_ref").cast("double"))).as("w1_q"))
  }
}
