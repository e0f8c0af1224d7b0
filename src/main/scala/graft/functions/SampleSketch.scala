package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X144 — X135's hash-sample as a *partial-merge-friendly* typed
  * Aggregator: keeps the k rows with the smallest (salted-hash, id)
  * keys, carrying the value payload, as an interleaved sorted
  * `Array[Long]` buffer of [h, id, v] triples (≤ 3k slots, no boxing).
  *
  * Why this exists when X135's rank window selects the same sample: the
  * window form shuffles EVERY row to its group's partition and sorts
  * there; this aggregate is associative/commutative with a ≤k-triple
  * buffer (the B56/X139 argument with a payload), so Spark runs it
  * partial → final — each map task ships at most k triples per (group,
  * partition) — and a STREAMING aggregation can maintain it
  * incrementally (one bounded state row per group). The bottom-k union
  * law (X135/X138) makes merge order irrelevant, and the (h, id) total
  * key replicates X135's `ORDER BY h, id` tie-break exactly, so the
  * sample — and every order statistic derived from it — is BIT-EQUAL
  * to the window form's.
  *
  * Determinism: the buffer is a pure function of the SET of inputs —
  * insertion skips duplicate (h, id) keys, truncation keeps the k
  * smallest, merge is a sorted-distinct union truncated to k.
  */
final class SampleSketch(k: Int)
    extends Aggregator[(Long, Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  // buffer layout: sorted-by-(h, id) interleaved [h, id, v] triples

  override def zero: Array[Long] = Array.emptyLongArray

  private def cmpKey(buf: Array[Long], i: Int, h: Long, id: Long): Int = {
    val c = java.lang.Long.compare(buf(3 * i), h)
    if (c != 0) c else java.lang.Long.compare(buf(3 * i + 1), id)
  }

  override def reduce(buf: Array[Long], in: (Long, Long, Long)): Array[Long] = {
    val (h, id, v) = in
    val n = buf.length / 3
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmpKey(buf, mid, h, id) < 0) lo = mid + 1 else hi = mid
    }
    if (n == k && lo == n) buf // not below the current worst key
    else if (lo < n && cmpKey(buf, lo, h, id) == 0) buf // duplicate key
    else {
      val outN = math.min(n + 1, k)
      val out = new Array[Long](3 * outN)
      System.arraycopy(buf, 0, out, 0, 3 * lo)
      out(3 * lo) = h
      out(3 * lo + 1) = id
      out(3 * lo + 2) = v
      val tail = outN - lo - 1 // drops the old worst triple when full
      if (tail > 0) System.arraycopy(buf, 3 * lo, out, 3 * (lo + 1), 3 * tail)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val na = a.length / 3
      val nb = b.length / 3
      val out = new Array[Long](3 * math.min(na + nb, k))
      var i = 0
      var j = 0
      var o = 0
      while (o < out.length && (i < na || j < nb)) {
        val c =
          if (i >= na) 1
          else if (j >= nb) -1
          else {
            val ch = java.lang.Long.compare(a(3 * i), b(3 * j))
            if (ch != 0) ch
            else java.lang.Long.compare(a(3 * i + 1), b(3 * j + 1))
          }
        if (c < 0) {
          System.arraycopy(a, 3 * i, out, o, 3); i += 1; o += 3
        } else if (c > 0) {
          System.arraycopy(b, 3 * j, out, o, 3); j += 1; o += 3
        } else { // same (h, id) key in both shards — take one
          System.arraycopy(a, 3 * i, out, o, 3); i += 1; j += 1; o += 3
        }
      }
      if (o == out.length) out else java.util.Arrays.copyOf(out, o)
    }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] =
    (0 until buf.length / 3).map(i => (buf(3 * i + 1), buf(3 * i + 2)))

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
