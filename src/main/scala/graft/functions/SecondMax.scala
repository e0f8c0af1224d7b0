package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** B24 — the typed UDAF surface: second-largest *distinct* value of a
  * double column, as an `Aggregator` with a 2-slot buffer (top-1, top-2).
  * Merge is associative/commutative, so the aggregate is partial-merge
  * friendly (map-side combine at any partition count) and the result is
  * order-independent — the same properties Spark's built-in aggregates
  * have, which is what makes a *correct* UDAF at 100 TB.
  *
  * Exists to exercise the extension surface (SURVEY.md §2.4 B24); anything
  * expressible with built-ins should use them instead (engine rule:
  * functions-not-UDFs). The DuckDB oracle for the registered query uses
  * the row_number-over-distinct form — same semantics, independent
  * derivation. Returns None (SQL null) for groups with < 2 distinct
  * values.
  *
  * Comparison uses Ordering.Double.TotalOrdering (NaN greatest), a total
  * order, so merge stays deterministic even on pathological inputs.
  */
object SecondMax extends Aggregator[Double, (Option[Double], Option[Double]), Option[Double]] {
  private val ord = Ordering.Double.TotalOrdering

  override def zero: (Option[Double], Option[Double]) = (None, None)

  // invariant: buf = (top1, top2), top1 > top2, Nones trail
  private def insert(
      buf: (Option[Double], Option[Double]), v: Double): (Option[Double], Option[Double]) =
    buf match {
      case (None, _) => (Some(v), None)
      case (Some(m1), _) if ord.equiv(v, m1) => buf
      case (Some(m1), _) if ord.gt(v, m1) => (Some(v), Some(m1))
      case (m1, None) => (m1, Some(v))
      case (_, Some(m2)) if ord.equiv(v, m2) => buf
      case (m1, Some(m2)) if ord.gt(v, m2) => (m1, Some(v))
      case _ => buf
    }

  override def reduce(
      buf: (Option[Double], Option[Double]), v: Double): (Option[Double], Option[Double]) =
    insert(buf, v)

  override def merge(
      a: (Option[Double], Option[Double]),
      b: (Option[Double], Option[Double])): (Option[Double], Option[Double]) = {
    val afterM1 = b._1.fold(a)(insert(a, _))
    b._2.fold(afterM1)(insert(afterM1, _))
  }

  override def finish(buf: (Option[Double], Option[Double])): Option[Double] = buf._2

  override def bufferEncoder: Encoder[(Option[Double], Option[Double])] =
    ExpressionEncoder[(Option[Double], Option[Double])]()
  override def outputEncoder: Encoder[Option[Double]] =
    ExpressionEncoder[Option[Double]]()
}
