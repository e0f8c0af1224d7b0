package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X45 — Count-Min sketch as a typed `Aggregator`: a [[Depth]]×[[W]]
  * i64 count matrix over pre-hashed 40-bit keys (see
  * [[Hashing.md5Long40]]). Point estimate = min over rows of the
  * addressed cell — never an underestimate, overestimate bounded by
  * collisions (ε ≈ e/W of the stream total per row, δ ≈ e^-Depth).
  *
  * The buffer is one flat Array[Long] (Depth·W = 4096 cells, 32 KiB):
  * reduce is 4 in-place increments, merge is element-wise addition —
  * associative and commutative, so the sketch is partial-merge
  * friendly (map-side combine at any partition count) and the result
  * is a deterministic function of the input MULTISET, independent of
  * order and partitioning. That determinism is what makes an exact
  * relational oracle possible: est_i(k) is literally the sum of counts
  * of all keys landing in k's row-i cell, which SQL can recompute by
  * grouping on the same cell index (see Sketch.cmsUserCountsSql).
  *
  * Row hashes are affine maps of the 40-bit key modulo the Mersenne
  * prime 2^61−1 then modulo W; A(i) < 2^20 keeps A·h < 2^60, so the
  * arithmetic is overflow-free in i64 in both engines.
  */
object CountMin extends Aggregator[Long, Array[Long], Array[Long]] {

  val Depth = 4
  val W = 1024
  val P: Long = (1L << 61) - 1
  val A: Seq[Long] = Seq(999983L, 777767L, 555557L, 333331L)
  val B: Seq[Long] = Seq(12347L, 45679L, 78901L, 101113L)

  /** Cell column index of key `h` in sketch row `i`. */
  def cellOf(i: Int, h: Long): Int = (((A(i) * h + B(i)) % P) % W).toInt

  override def zero: Array[Long] = Array.fill(Depth * W)(0L)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var i = 0
    while (i < Depth) { buf(i * W + cellOf(i, h)) += 1; i += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
