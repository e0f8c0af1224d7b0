package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.SampleSketch
import graft.functions.Hashing.md5Long40
import graft.ops.QuantileSketch

/** X144 (streaming half) — per-source quantile sketches maintained
  * INCREMENTALLY over an unbounded document stream: the
  * [[graft.functions.SampleSketch]] bounded aggregator dropped into a
  * streaming groupBy in complete mode. Each micro-batch folds its rows
  * into ≤K-triple partial buffers, the state store holds exactly ONE
  * bounded row per source (a uniform always-fresh sample of everything
  * seen — the streaming holdout/eval-reservoir primitive), and every
  * trigger emits the quantile estimates-so-far, computed ROW-LOCALLY
  * from the sample array (an array_sort + element_at over ≤K entries —
  * no second aggregation, which a stream could not run anyway). The
  * bottom-k union law makes the incremental sample independent of how
  * the stream was sliced into batches — StreamQuantileSpec pins
  * streamed ≡ batch across a micro-batch boundary, batch ≡ X135's
  * window-form estimates, and the per-source state bound.
  */
object StreamQuantile {

  /** Per-source quantile estimates over a (streaming or batch)
    * documents frame with `source`, `doc_id`, `n_chars` columns. Emits
    * (source, k_used, est_p25, est_p50, est_p90) — X135's estimate
    * columns (the exact audit needs a second pass a stream doesn't
    * have; below capacity the sample IS the source, so estimates are
    * exact by construction).
    */
  def sourceQuantiles(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sk = udaf(new SampleSketch(QuantileSketch.K),
      ExpressionEncoder[(Long, Long, Long)]())
    val byValue = // X135's (v, id) order-statistic order, row-locally
      "array_sort(ks, (a, b) -> CASE WHEN a._2 < b._2 THEN -1 " +
        "WHEN a._2 > b._2 THEN 1 WHEN a._1 < b._1 THEN -1 " +
        "WHEN a._1 > b._1 THEN 1 ELSE 0 END)"
    val est = QuantileSketch.Qs.map { q =>
      expr(s"element_at($byValue, " +
        s"cast((size(ks) * $q + 99) div 100 as int))._2")
        .as(s"est_p$q")
    }
    docs
      .select($"source",
        md5Long40(concat($"doc_id".cast("string"), lit(":qs"))).as("h"),
        $"doc_id".as("id"), $"n_chars".as("v"))
      .groupBy($"source")
      .agg(sk($"h", $"id", $"v").as("ks"))
      .select(Seq($"source", size($"ks").cast("long").as("k_used")) ++
        est: _*)
  }
}
