package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Strips the inherited origin statistics from a checkpoint-backed
  * frame (round-19 fix).
  *
  * `Dataset.localCheckpoint` truncates the logical plan to a
  * [[LogicalRDD]] but passes the ORIGIN plan's computed `Statistics`
  * along (so the optimizer keeps size information across the
  * checkpoint). Inside an iterative fixpoint — connected components'
  * label loop — that inheritance COMPOUNDS: round N's plan joins
  * round N−1's checkpoint k+1 times, the size-only stats visitor
  * estimates every inner join as the PRODUCT of its children's
  * sizeInBytes, and the checkpoint stores that product as round N's
  * origin stats. The estimate's bit-length multiplies by ~(k+1) every
  * round; by round ~10 of a label⁴ loop the "statistic" is a BigInt
  * with hundreds of millions of bits, and the driver burns hours
  * inside BigInteger.multiply while planning a 1239-row query
  * (observed live: ToomCook3 frames under
  * SizeInBytesOnlyStatsPlanVisitor.visitJoin). The same compounding is
  * latent at ANY hop depth — label² merely doubles the bit-length per
  * round, so high-diameter graphs hit the identical wall later.
  *
  * The fix: rebuild the same LogicalRDD — same RDD (no recompute, the
  * checkpointed blocks stay pinned), same output attributes, same
  * partitioning and ordering — with `originStats = None`, so each
  * round's stats start from the size-estimation defaults instead of
  * the previous round's product. Join-strategy quality is unaffected:
  * AQE re-plans every exchange from RUNTIME sizes, which is where the
  * loop's broadcast decisions actually come from. Constraints are
  * carried over (they do not compound).
  *
  * Lives under org.apache.spark.sql.* solely for access to the
  * private[sql] Dataset.ofRows / classic session — the ColumnBridge
  * precedent; contains no logic beyond the re-wrap.
  */
object CheckpointBridge {
  def withoutOriginStats(df: DataFrame): DataFrame = {
    val qe = df.queryExecution
    qe.logical match {
      case l: LogicalRDD =>
        org.apache.spark.sql.classic.Dataset.ofRows(
          qe.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
            l.outputOrdering, l.isStreaming, l.stream)(
            qe.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
            None, Some(l.constraints)))
      case _ => df
    }
  }
}
