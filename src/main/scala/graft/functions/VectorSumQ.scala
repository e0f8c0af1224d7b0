package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X162 — element-wise i64 vector sum as a typed Aggregator: buffer is
  * `[n, s₀ … s_{D−1}]` (one count + D quantized dimension sums), the
  * exact mergeable state behind every centroid in the engine (X36's
  * (label, dim) partial aggregate, flattened into ONE row per group so
  * a STREAMING aggregation can maintain it — Spark rejects the
  * two-level (label, dim) grouping + collect_list assembly in a
  * stream, and |labels|·D state rows would be the wrong shape anyway).
  *
  * Linear in the strongest sense (i64 adds commute and associate), so
  * partial merge order, partition count, and micro-batch slicing are
  * all provably irrelevant — streamed ≡ batch is BIT-equal, and the
  * centroid derived from the buffer (CAST(s AS DOUBLE)/n/scale) is
  * X36's exact chain verbatim. D is fixed by the first input row;
  * buffers of mismatched D fail loudly (a ragged embedding column is
  * data corruption, not something to average over).
  */
final class VectorSumQ
    extends Aggregator[Array[Long], Array[Long], Seq[Long]] {

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], in: Array[Long]): Array[Long] =
    if (buf.isEmpty) {
      val out = new Array[Long](in.length + 1)
      out(0) = 1L
      System.arraycopy(in, 0, out, 1, in.length)
      out
    } else {
      require(buf.length == in.length + 1,
        s"ragged vector: buffer D=${buf.length - 1}, row D=${in.length}")
      val out = new Array[Long](buf.length)
      out(0) = buf(0) + 1L
      var i = 0
      while (i < in.length) { out(i + 1) = buf(i + 1) + in(i); i += 1 }
      out
    }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      require(a.length == b.length,
        s"ragged vector: shards D=${a.length - 1} vs ${b.length - 1}")
      val out = new Array[Long](a.length)
      var i = 0
      while (i < a.length) { out(i) = a(i) + b(i); i += 1 }
      out
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
