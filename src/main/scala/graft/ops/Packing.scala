package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X26 — sequence packing: assign documents, in doc_id order, to
  * fixed-capacity token windows (the sample-packing layout step before
  * training: each doc gets the global token offset where it starts, the
  * pack it lands in, and its offset within the pack).
  *
  * The interesting part is the GLOBAL PREFIX SUM. The naive expression —
  * `sum(n_tokens) OVER (ORDER BY doc_id)` with no partition clause — is
  * the classic 100 TB trap: Spark plans an un-partitioned window as ONE
  * task holding the whole corpus. This operator computes the identical
  * result with the standard two-phase decomposition, all phases
  * partition-parallel:
  *
  *  1. range-repartition by doc_id (RangePartitioner assigns ascending
  *     key ranges to ascending partition ids, so partition order is
  *     global order);
  *  2. per-partition running sums via a window PARTITIONED by the
  *     physical partition id (parallel across partitions);
  *  3. per-partition totals (tiny: one row per partition) joined
  *     triangularly to form each partition's global starting offset —
  *     P² pairs of scalar rows, broadcast back;
  *  4. global offset = partition offset + local running sum.
  *
  * The DuckDB oracle computes the naive single-sequence form — the
  * decomposition is proven bit-equal to it by the hash gate.
  */
object Packing {

  /** Tokens per pack in the registered query (the oracle mirrors it). */
  val PackCapacity = 2048L

  def sequencePacking(spark: SparkSession, dir: String): DataFrame =
    packingOf(Tables.documents(spark, dir), PackCapacity)

  def packingOf(docs: DataFrame, capacity: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    // Materialize the ranged slim projection ONCE. RangePartitioner picks
    // its boundaries by reservoir-sampling, so two instantiations of this
    // exchange need not agree on them — and the plan DOES instantiate it
    // more than once: the consuming branches (running-sum window, per-pid
    // totals) rely on AQE stage reuse to share one shuffle, but that reuse
    // is a planning-time race when identical exchanges materialize
    // concurrently, and the triangular key side even plans a column-pruned
    // variant (different canonical form, never reused). If any two
    // instances disagree on a boundary, `pid` names different row sets in
    // different branches and part_offset drifts by a few tokens there — a
    // nondeterministic, run-dependent wrong answer (caught by the round-5
    // driver hash gate, while quiet local sessions won the reuse race and
    // stayed green). localCheckpoint freezes one physical partitioning
    // that every consumer then reads; the checkpointed data is the slim
    // (doc_id, n_tokens, pid) projection, never the text.
    val toks = docs
      .select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"))
      .repartitionByRange(parallelism, $"doc_id")
      .withColumn("pid", spark_partition_id())
      .localCheckpoint()
    // phase 2: local running (exclusive) sums — windows keyed by pid run
    // in parallel, one per partition
    val localW = Window.partitionBy($"pid").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = toks.withColumn("local_cum",
      coalesce(sum($"n_tokens").over(localW), lit(0L)))
    // phase 3: per-partition totals → triangular self-join → each
    // partition's global starting offset (P rows; P² scalar pairs)
    val partials = toks.groupBy($"pid").agg(sum($"n_tokens").as("psum"))
    val offsets = partials.as("a")
      .join(partials.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.psum")), lit(0L)).as("part_offset"))
    // phase 4: compose, then derive the pack layout row-locally
    local.join(broadcast(offsets), "pid")
      .withColumn("start_offset", $"part_offset" + $"local_cum")
      .select($"doc_id", $"n_tokens", $"start_offset",
        ($"start_offset" / capacity).cast("long").as("pack_id"),
        ($"start_offset" % capacity).as("offset_in_pack"))
      .orderBy($"doc_id")
  }

  val sequencePackingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_offset
       |  FROM t)
       |SELECT doc_id, n_tokens, start_offset,
       |       start_offset // $PackCapacity AS pack_id,
       |       start_offset % $PackCapacity AS offset_in_pack
       |FROM c
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x26_sequence_packing" -> sequencePacking _)

  val oracles: Map[String, String] = Map(
    "x26_sequence_packing" -> sequencePackingSql)
}
