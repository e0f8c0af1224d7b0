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
  *  1. bucket rows by a row-local, order-preserving key-range function
  *     `pid = (doc_id - min) div width` (deterministic from the data —
  *     see the note in [[packingOf]]);
  *  2. per-bucket running sums via a window PARTITIONED by `pid`
  *     (parallel across buckets);
  *  3. per-bucket totals (tiny: one row per bucket) joined
  *     triangularly to form each bucket's global starting offset —
  *     P² pairs of scalar rows, broadcast back;
  *  4. global offset = bucket offset + local running sum.
  *
  * The DuckDB oracle computes the naive single-sequence form — the
  * decomposition is proven bit-equal to it by the hash gate.
  */
object Packing {

  /** Tokens per pack in the registered query (the oracle mirrors it). */
  val PackCapacity = 2048L

  def sequencePacking(spark: SparkSession, dir: String): DataFrame =
    packingOf(Tables.documents(spark, dir), PackCapacity)

  def packingOf(docs: DataFrame, capacity: Long): DataFrame =
    packingCoreOf(docs, capacity).orderBy(col("doc_id"))

  /** [[packingOf]] without the final presentation sort (the X91
    * composition joins the pack layout back onto its manifest by doc_id,
    * so an inner global sort would be a wasted range exchange). Returns
    * an empty correctly-typed frame when `docs` is empty — the min/max
    * scalar fetch has no row to anchor the bucket width on.
    */
  private[graft] def packingCoreOf(docs: DataFrame, capacity: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    // Bucketing must be a DETERMINISTIC function of the data. The previous
    // form (repartitionByRange + spark_partition_id + localCheckpoint)
    // derived `pid` from RangePartitioner's reservoir-sampled boundaries —
    // a physical-execution artifact that two instantiations of the same
    // exchange need not agree on. Even checkpoint-frozen, it kept failing
    // the round-6 driver hash gate under full-suite session pressure while
    // staying green locally. Row-local `pid = (doc_id - min) / width` is
    // order-preserving (pid asc, doc_id asc ⟺ doc_id asc), identical on
    // every instantiation, and survives any recompute — nothing physical
    // to freeze. Cost: one scalar min/max scan of the key column (parquet
    // footer stats at cluster scale). Buckets are balanced when doc_id is
    // dense (it is here); skew only widens a window partition, never
    // breaks correctness.
    val bounds = docs.agg(
      min($"doc_id").cast("long"), max($"doc_id").cast("long"))
      .collect()(0)
    if (bounds.isNullAt(0)) {
      // empty input: no anchor for the bucket width; the layout is empty
      return docs.select($"doc_id".cast("long"),
        lit(0L).as("n_tokens"), lit(0L).as("start_offset"),
        lit(0L).as("pack_id"), lit(0L).as("offset_in_pack"))
        .where(lit(false))
    }
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (mx - mn) / parallelism + 1L)
    // `div` = exact integral division (the `/` Column operator is double
    // division — lossy past 2^53); materialize so the two consumers
    // (running-sum window, per-pid totals) tokenize once. localCheckpoint
    // (the Heaps pattern), NOT cache(): a cache inside a registered query
    // outlives it as a session-lifetime InMemoryRelation — checkpoint
    // blocks are reclaimed once the frame is unreachable
    val toks = docs
      .select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("pid", expr(s"(doc_id - ${mn}L) div ${width}L"))
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
        expr(s"start_offset div ${capacity}L").as("pack_id"),
        ($"start_offset" % capacity).as("offset_in_pack"))
  }

  val sequencePackingSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |           AS start_offset
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
