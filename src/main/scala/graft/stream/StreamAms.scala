package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.AmsF2
import graft.functions.Hashing.md5Long40

/** X161 — streaming AMS maintenance: per-source sign-sum sketches kept
  * incrementally over an unbounded stream, emitting each trigger the
  * live self-join-size estimate (X136's F2 — the quadratic-blow-up
  * alarm) and the live cross-join-size estimate against a pinned
  * reference sketch (X159's inner product — "how much does this feed
  * now overlap the reference corpus, with multiplicities"). The AMS
  * sketch is the family's most streaming-native state: it is LINEAR
  * (X_r(A ⊎ B) = X_r(A) + X_r(B)), so the state is 32 plain SUM
  * columns — Spark's streaming aggregation maintains it natively with
  * no custom Aggregator, micro-batch slicing is irrelevant by
  * construction, and streamed ≡ batch is BIT-equal (everything i64;
  * StreamAmsSpec pins it across a micro-batch boundary).
  *
  * State: ONE bounded row per source (32 counters + a count). Both
  * estimates are computed ROW-LOCALLY from the counters (integer
  * squares/products, floor division — X136/X159's expressions
  * verbatim); the reference sketch is a |sources|-row static frame
  * joined stream-static (stateless).
  *
  * Reference scope: the reference computes windowed aggregates on a
  * stream (spark_processor.py:147-166) but has no sketches; engine
  * extension (SURVEY §2.5, closing the streaming forms of the
  * X136/X159 linear-sketch pair the way X139/X143/X144 closed
  * KMV/HLL/sample).
  */
object StreamAms {

  val R = AmsF2.R

  /** The pinned reference: per-source AMS sketch of a reference corpus
    * (batch — X136's sketchOf with columns renamed r0..r31). */
  def refSketch(rows: DataFrame): DataFrame = {
    val renames = col("grp") +: col("n_rows").as("ref_rows") +:
      (0 until R).map(r => col(s"x$r").as(s"r$r"))
    AmsF2.sketchOf(rows).select(renames: _*)
  }

  /** Per-source live F2 + join-size-vs-reference estimates over a
    * (streaming or batch) (grp, v) frame.
    *
    * The reference sketch is joined LEFT from the live side (round-13
    * advice item): a brand-new feed with no calibration row must still
    * emit its live F2 — the quadratic-blow-up alarm works without a
    * reference — flagged has_ref=false with ref_rows=0 and a NULL
    * est_join_ref (no sketch, no overlap estimate; NULL is honest where
    * 0 would read as "measured disjoint").
    */
  def amsMonitor(rows: DataFrame, ref: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val signed = rows.select($"grp", md5Long40($"v").as("h0"))
    val sums = count(lit(1)).cast("long").as("n_rows") +:
      (0 until R).map(r => sum(
        when(shiftright($"h0", r).bitwiseAND(lit(1L)) === 1L, 1L)
          .otherwise(-1L)).as(s"x$r"))
    val selfDot = (0 until R).map(r => col(s"x$r") * col(s"x$r"))
      .reduce(_ + _)
    val refDot = (0 until R).map(r => col(s"x$r") * col(s"r$r"))
      .reduce(_ + _)
    signed.groupBy($"grp").agg(sums.head, sums.tail: _*)
      .join(ref, Seq("grp"), "left")
      .withColumn("has_ref", $"ref_rows".isNotNull)
      .withColumn("ss", selfDot)
      .withColumn("rs", refDot)
      .select($"grp", $"n_rows",
        coalesce($"ref_rows", lit(0L)).as("ref_rows"), $"has_ref",
        expr(s"ss div $R").as("est_f2"),
        when($"has_ref", expr(s"rs div $R")).otherwise(lit(null))
          .cast("long").as("est_join_ref"))
  }
}
