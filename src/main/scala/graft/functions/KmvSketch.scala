package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X139 — the KMV sketch as a *partial-merge-friendly* typed
  * Aggregator: keeps the k smallest DISTINCT i64 hashes seen, as a
  * sorted `Array[Long]` buffer (≤ k slots, no boxing).
  *
  * Why this exists when X134's rank window computes the same answer:
  * the window form shuffles EVERY distinct hash to its group's
  * partition and sorts there — at 100 TB that is the whole distinct
  * stream through the wire. This aggregate is associative/commutative
  * with a ≤k-slot buffer (the B56 argument, inverted order), so Spark
  * runs it as ObjectHashAggregate partial → final: each map task
  * ships at most k hashes per (group, partition). It is also the form
  * a STREAMING aggregation can maintain incrementally — the state
  * store holds one ≤k buffer per group, and the bottom-k union law
  * (X135/X138) makes merge order irrelevant.
  *
  * Dedup lives INSIDE the aggregator (binary-search insert skips
  * equals), so callers feed raw hashes — no upstream distinct, which
  * a stream could not afford (unbounded state).
  *
  * Determinism: the buffer is a pure function of the SET of inputs —
  * insertion skips duplicates, truncation keeps the k smallest, and
  * merge is a sorted-distinct union truncated to k; no order
  * dependence anywhere.
  */
final class KmvSketch(k: Int)
    extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val n = buf.length
    if (n == k && h >= buf(n - 1)) buf // not smaller than current worst
    else {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid) < h) lo = mid + 1 else hi = mid
      }
      if (lo < n && buf(lo) == h) buf // duplicate hash — a no-op
      else {
        val outN = math.min(n + 1, k)
        val out = new Array[Long](outN)
        System.arraycopy(buf, 0, out, 0, lo)
        out(lo) = h
        val tail = outN - lo - 1 // drops the old worst when full
        if (tail > 0) System.arraycopy(buf, lo, out, lo + 1, tail)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0
      var j = 0
      var o = 0
      var last = Long.MinValue
      var first = true
      while (o < out.length && (i < a.length || j < b.length)) {
        val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
        val v = if (takeA) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (first || v != last) {
          out(o) = v; o = o + 1; last = v; first = false
        }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

  override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
