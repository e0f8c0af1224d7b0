package graft.stream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.Psi

/** X167 — streaming PSI maintenance: per-source Population Stability
  * Index of the live stream's document-length distribution against a
  * pinned per-source reference, kept incrementally over an unbounded
  * stream — the drift family's last batch-only member (X163) closed
  * the way X161 closed the linear-sketch pair. The state is the X163
  * band-count vector: [[Psi.Bands]] conditional counts per source —
  * plain SUM columns, which Spark's streaming aggregation maintains
  * natively (the "linear sketch = plain SUM state" argument applies
  * verbatim: counts are linear in the stream, micro-batch slicing is
  * irrelevant by construction), so streamed ≡ batch is BIT-equal and
  * needs NO reservoir — unlike X152's KS/W₁, PSI is a banded statistic
  * and the bands are code constants.
  *
  * Exactness: band counts exact i64; the smoothed shares are double
  * divisions of identical exact operands (X163's Laplace +1
  * convention on BOTH sides); each PSI term is i64-quantized
  * (floor(term·1e9)) before the cross-band add chain and divided back
  * once — X163's term math verbatim, so the monitor and the nightly
  * batch audit speak the same number.
  *
  * The reference is joined LEFT from the live side (the round-13
  * advice convention shared with X152/X161/X162): a source the
  * calibration never saw emits has_ref=false with NULL psi — the flag
  * is the alarm, not a fake magnitude.
  *
  * Scale shape: state is ONE bounded row per source (1 + |bands|
  * longs); each trigger folds the micro-batch into partial sums
  * map-side; the reference is a |sources|-row static frame joined
  * stream-static (stateless); the term math is O(|bands|) row-local
  * work per source per trigger.
  *
  * Reference scope: the reference computes windowed aggregates on a
  * stream (spark_processor.py:147-166) but has no drift monitoring;
  * engine extension (SURVEY §2.5, the X163/X152 drift family).
  */
object StreamPsi {

  val Bands = Psi.Bands
  val BandWidth = Psi.BandWidth

  private def bandOf(v: Column): Column =
    least(floor(v.cast("double") / BandWidth).cast("long"),
      lit((Bands - 1).toLong))

  /** The pinned reference: per-source band counts of a reference
    * corpus (batch — run once at calibration time, stored). */
  def refBands(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("n_ref") +:
      (0 until Bands).map(i =>
        sum(when($"b" === i.toLong, 1L).otherwise(0L)).as(s"r$i"))
    docs.select($"source", bandOf($"n_chars").as("b"))
      .groupBy($"source")
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Per-source live PSI vs the static reference over a (streaming or
    * batch) (source, n_chars) frame. Emits (source, n_cur, n_ref,
    * has_ref, psi). */
  def psiMonitor(docs: DataFrame, ref: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val aggs = count(lit(1)).as("n_cur") +:
      (0 until Bands).map(i =>
        sum(when($"b" === i.toLong, 1L).otherwise(0L)).as(s"c$i"))
    val terms = (0 until Bands).map { i =>
      val p = (col(s"c$i") + lit(1L)).cast("double") /
        ($"n_cur" + lit(Bands.toLong)).cast("double")
      val q = (col(s"r$i") + lit(1L)).cast("double") /
        ($"n_ref" + lit(Bands.toLong)).cast("double")
      floor((p - q) * log(p / q) * lit(1e9)).cast("long")
    }
    docs.select($"source", bandOf($"n_chars").as("b"))
      .groupBy($"source")
      .agg(aggs.head, aggs.tail: _*)
      .join(ref, Seq("source"), "left")
      .withColumn("has_ref", $"n_ref".isNotNull)
      .select($"source", $"n_cur",
        coalesce($"n_ref", lit(0L)).as("n_ref"), $"has_ref",
        when($"has_ref",
          terms.reduce(_ + _).cast("double") / lit(1e9))
          .otherwise(lit(null)).cast("double").as("psi"))
  }
}
