package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X143 — X140's explicit HLL registers as ONE bounded typed
  * Aggregator: a fixed 64-slot `Array[Long]` of register ranks,
  * reduce = max into the hash's bucket, merge = element-wise max.
  *
  * Why this exists when X140's relational form computes the same
  * registers: the relational form is TWO stacked aggregations
  * (groupBy(grp, j).max then groupBy(grp)) — exactly the shape
  * Structured Streaming cannot run incrementally (chained streaming
  * aggregations are unsupported), and two shuffles where one suffices.
  * Folding the whole sketch into one Aggregator makes it a single
  * partial→final aggregate: each map task ships ONE 64-long buffer per
  * (group, partition), and a streaming groupBy maintains ONE bounded
  * state row per group (stream/StreamHll.scala). Element-wise max is
  * idempotent, commutative, and associative, so duplicates die in the
  * partials and merge order is irrelevant — HllSpec/StreamHllSpec pin
  * aggregator ≡ relational registers and streamed ≡ batch.
  *
  * The buffer IS the sketch (rank 0 = never-hit bucket); estimation
  * stays in the SQL layer ([[graft.ops.Hll]] semantics) so the
  * aggregator has one job.
  */
final class HllSketch extends Aggregator[Long, Array[Long], Seq[Long]] {

  /** Register count — X140's m (low 6 hash bits select the bucket). */
  val M = 64

  override def zero: Array[Long] = new Array[Long](M)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val j = (h & (M - 1)).toInt
    val w = h >> 6
    val rho =
      if (w == 0L) 35L
      else 35L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > buf(j)) buf(j) = rho
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < M) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
