package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** B56 — bounded top-k as a *partial-merge-friendly* typed Aggregator.
  *
  * Keeps the k lexicographically-smallest `(k1, k2)` i64 pairs seen, as a
  * flat interleaved sorted `Array[Long]` buffer (≤ 2k slots, no boxing on
  * the hot path). Callers encode their ranking into the pair: descending
  * orders negate the key (`k1 = -priceCents`), the tie-break rides in
  * `k2` (a row id), and any payload re-attaches afterwards by joining on
  * `k2` — the aggregator itself never carries wide rows.
  *
  * Why this exists when a window `row_number() ≤ k` computes the same
  * answer: the window form shuffles EVERY row to its group's partition
  * and sorts there — at 100 TB with heavy groups that is the whole fact
  * table through the wire, then |group| log |group| each. This aggregate
  * is associative/commutative with a ≤k-pair buffer, so Spark runs it as
  * ObjectHashAggregate partial → final: each map task ships at most k
  * pairs PER (group, partition), never its rows. Grouped top-k is the
  * poster child for partial aggregation, and the reason it must be an
  * Aggregator rather than collect_list + slice (whose partials are
  * unbounded).
  *
  * Determinism: insertion position and truncation depend only on the
  * pair order (a total order on (i64, i64)); equal pairs are
  * interchangeable. Merge order therefore cannot change the result.
  */
final class TopKLongPairs(k: Int)
    extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
  require(k > 0, s"k must be positive, got $k")

  override def zero: Array[Long] = Array.emptyLongArray

  @inline private def lt(a1: Long, a2: Long, b1: Long, b2: Long): Boolean =
    a1 < b1 || (a1 == b1 && a2 < b2)

  override def reduce(buf: Array[Long], v: (Long, Long)): Array[Long] = {
    val n = buf.length >> 1
    // full and v not smaller than the current worst → unchanged buffer
    if (n == k && !lt(v._1, v._2, buf(2 * k - 2), buf(2 * k - 1))) buf
    else {
      var lo = 0
      var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (lt(buf(2 * mid), buf(2 * mid + 1), v._1, v._2)) lo = mid + 1
        else hi = mid
      }
      val outN = math.min(n + 1, k)
      val out = new Array[Long](outN * 2)
      System.arraycopy(buf, 0, out, 0, lo * 2)
      out(2 * lo) = v._1
      out(2 * lo + 1) = v._2
      val tailPairs = outN - lo - 1 // drops the old worst when full
      if (tailPairs > 0) System.arraycopy(buf, lo * 2, out, (lo + 1) * 2, tailPairs * 2)
      out
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val na = a.length >> 1
      val nb = b.length >> 1
      val outN = math.min(na + nb, k)
      val out = new Array[Long](outN * 2)
      var i = 0
      var j = 0
      var o = 0
      while (o < outN) {
        val takeA =
          j >= nb || (i < na && !lt(b(2 * j), b(2 * j + 1), a(2 * i), a(2 * i + 1)))
        if (takeA) {
          out(2 * o) = a(2 * i); out(2 * o + 1) = a(2 * i + 1); i += 1
        } else {
          out(2 * o) = b(2 * j); out(2 * o + 1) = b(2 * j + 1); j += 1
        }
        o += 1
      }
      out
    }

  override def finish(buf: Array[Long]): Seq[(Long, Long)] =
    (0 until (buf.length >> 1)).map(i => (buf(2 * i), buf(2 * i + 1)))

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(Long, Long)]] =
    ExpressionEncoder[Seq[(Long, Long)]]()
}
