package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Hashing, HllSketch}
import graft.ops.Hll

/** X143 — per-source HLL cardinality sketches maintained INCREMENTALLY
  * over an unbounded document stream: the [[graft.functions.HllSketch]]
  * 64-register aggregator dropped into a streaming groupBy in complete
  * mode. X140's relational register build is two stacked aggregations —
  * the shape Structured Streaming cannot run incrementally — so the
  * streaming form folds the whole sketch into ONE bounded aggregate:
  * each micro-batch maxes its hashes into 64-slot partial buffers, the
  * state store holds exactly ONE 64-long row per source (never per
  * document, never per distinct content — max() is idempotent, so no
  * upstream distinct and no unbounded state), and every trigger emits
  * the estimate-so-far. Element-wise max makes the incremental result
  * independent of micro-batch slicing — StreamHllSpec pins streamed ≡
  * batch across a boundary, batch-aggregator ≡ X140's relational
  * registers, and the per-source state bound.
  *
  * The streaming analog of X47's CMS and X139's KMV maintenance, for
  * the register-sketch corner: a live distinct-content view at 64 longs
  * per source. Estimation reuses X140's exact-dyadic S and the
  * round-6-aligned linear-counting branch (same constants, same
  * expression shapes) so the two forms stay law-compatible.
  */
object StreamHll {

  /** Per-source HLL estimate over a (streaming or batch) documents
    * frame with `source` and `text` columns. Emits (source, n_regs,
    * v_zero, s_sum, est_raw, est) — X140's columns minus the exact
    * audit (a stream has no countDistinct to lean on).
    */
  def sourceHll(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val hll = udaf(new HllSketch)
    docs
      .select($"source", Hashing.md5Long40($"text").as("h"))
      .groupBy($"source")
      .agg(hll($"h").as("ks"))
      .withColumn("n_regs",
        size(filter($"ks", m => m > 0L)).cast("long"))
      .withColumn("v_zero", lit(Hll.M.toLong) - $"n_regs")
      .withColumn("s_sum", expr(
        "aggregate(ks, cast(0 as double), (acc, m) -> acc + " +
          "cast(1 as double) / cast(shiftleft(1L, cast(m as int)) as double))"))
      .withColumn("est_raw",
        (lit(Hll.Alpha) * lit((Hll.M * Hll.M).toDouble)) / $"s_sum")
      .withColumn("est",
        when($"v_zero" > 0L && $"est_raw" <= lit(2.5 * Hll.M),
          round(lit(Hll.M.toDouble) * log(lit(Hll.M.toDouble) /
            $"v_zero".cast("double")), 6))
          .otherwise($"est_raw"))
      .drop("ks")
  }
}
