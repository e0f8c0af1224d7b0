package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** X168/X169 — bounded keyed-count buffers: the typed-Aggregator state
  * behind the streaming quality monitors. The buffer is a plain
  * key→count map, so the aggregate is LINEAR (merge = union-sum):
  * micro-batch slicing cannot change the final counts, making streamed
  * ≡ batch bit-equal — the X161 "linear sketch = plain SUM state"
  * argument with a keyed domain instead of fixed columns. Boundedness
  * is the CALLER's contract: keys must come from a saturating domain
  * (event types, source×lang cells — the `types` bound class), never a
  * corpus-cardinality id.
  */
final class KeyedCounts
    extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], k: String): Map[String, Long] =
    m.updated(k, m.getOrElse(k, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  /** Sorted by key — a deterministic array whatever the merge order. */
  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy(_._1)

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}

/** X169's cell buffer: counts keyed by the NUL-joined (lhs, rhs) pair
  * of one functional dependency, folded at finish into X165's four
  * exact i64 statistics (groups, violating groups, violating row mass,
  * total rows) — the fold reads only the final map, so it inherits the
  * linearity argument above. Callers must guarantee lhs never contains
  * the NUL separator (categorical columns here).
  */
final class FdCells
    extends Aggregator[String, Map[String, Long], (Long, Long, Long, Long)] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], k: String): Map[String, Long] =
    m.updated(k, m.getOrElse(k, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[String, Long]): (Long, Long, Long, Long) = {
    val byLhs = m.toSeq
      .map { case (k, c) => (k.substring(0, k.indexOf('\u0000')), c) }
      .groupBy(_._1)
    var nGroups = 0L
    var nViolatingGroups = 0L
    var nViolatingRows = 0L
    var nRows = 0L
    byLhs.foreach { case (_, cells) =>
      val n = cells.map(_._2).sum
      val maj = cells.map(_._2).max
      nGroups += 1L
      if (cells.length > 1) nViolatingGroups += 1L
      nViolatingRows += n - maj
      nRows += n
    }
    (nGroups, nViolatingGroups, nViolatingRows, nRows)
  }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[(Long, Long, Long, Long)] =
    ExpressionEncoder[(Long, Long, Long, Long)]()
}
