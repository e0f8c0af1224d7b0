package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X80 — length-bucketed batch planner: group documents into
  * similar-length buckets, cut each bucket into fixed-size batches, and
  * report the padding waste per batch — the pad-efficiency layout step a
  * training loader runs after packing decisions (x26 packs variable
  * counts into a fixed token budget; this keeps the batch COUNT fixed —
  * the dense-attention / fixed-batch-shape regime — and minimizes the
  * `max_len · batch_size − Σ len` padding each batch pays).
  *
  * Scale shape:
  *  - bucket boundaries are the (k/8)-th exact interpolated percentiles
  *    of the token-count distribution, from ONE aggregate row (b39's
  *    parity-proven PERCENTILE_CONT machinery; at open scale the
  *    documented approx_percentile swap applies) broadcast back onto the
  *    scan — bucketing is then row-local arithmetic, never a global
  *    ntile/percent_rank window over the corpus;
  *  - in-bucket ranks come from a window PARTITIONED BY bucket (8-way
  *    parallel; at 100 TB the same rank derives hierarchically the way
  *    x42 builds shard ranks: hash-sub-partition within bucket, local
  *    sort, offset by sub-partition counts — same plan family, no
  *    single-task stage);
  *  - the batch ledger is a two-phase (bucket, batch) aggregate — output
  *    is ≤ |corpus|/batch_size rows, everything downstream of the rank
  *    partial-aggregates.
  *
  * Determinism for the oracle: boundaries interpolate the same two order
  * statistics in both engines (b39's argument), bucket membership
  * compares i64 token counts against those identical doubles, ranks
  * order by the total (n_tokens, doc_id) key, and padding_frac divides
  * identical i64 products — bit-equal end to end.
  */
object Batching {

  val NBuckets = 8
  val BatchSize = 32

  def lengthBucketBatches(spark: SparkSession, dir: String): DataFrame =
    lengthBucketBatchesOf(Tables.documents(spark, dir))

  /** Core of X80 over any (doc_id, text) frame; test/scale seam. */
  private[graft] def lengthBucketBatchesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select($"doc_id",
      size(split(trim(lower($"text")), "\\s+")).cast("long").as("n_tokens"))
    val boundCols = (1 until NBuckets).map { k =>
      expr(s"percentile_cont(${k.toDouble / NBuckets}) " +
        "WITHIN GROUP (ORDER BY n_tokens)").as(s"b$k")
    }
    val bounds = toks.agg(boundCols.head, boundCols.tail: _*)
    val bucket = (1 until NBuckets)
      .map(k => when($"n_tokens" > col(s"b$k"), 1).otherwise(0))
      .reduce(_ + _)
    val bucketed = toks.crossJoin(broadcast(bounds))
      .select($"doc_id", $"n_tokens", bucket.cast("long").as("bucket"))
    val byBucket = Window.partitionBy($"bucket")
      .orderBy($"n_tokens".asc, $"doc_id".asc)
    bucketed
      .withColumn("rn", row_number().over(byBucket))
      .withColumn("batch_id",
        floor(($"rn" - 1) / BatchSize).cast("long"))
      .groupBy($"bucket", $"batch_id")
      .agg(
        count(lit(1)).as("n_docs"),
        min($"n_tokens").as("min_len"),
        max($"n_tokens").as("max_len"),
        sum($"n_tokens").as("sum_tokens"))
      .select($"bucket", $"batch_id", $"n_docs", $"min_len", $"max_len",
        $"sum_tokens",
        (($"max_len" * $"n_docs" - $"sum_tokens").cast("double")
          / ($"max_len" * $"n_docs").cast("double")).as("padding_frac"))
      .orderBy($"bucket", $"batch_id")
  }

  val lengthBucketBatchesSql: String = {
    val boundSelects = (1 until NBuckets).map { k =>
      s"percentile_cont(${k.toDouble / NBuckets}) " +
        s"WITHIN GROUP (ORDER BY n_tokens) AS b$k"
    }.mkString(",\n         ")
    val bucketSum = (1 until NBuckets)
      .map(k => s"(CASE WHEN n_tokens > b$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
       |           AS n_tokens
       |  FROM documents),
       |b AS (
       |  SELECT $boundSelects
       |  FROM toks),
       |bucketed AS (
       |  SELECT doc_id, n_tokens,
       |         CAST($bucketSum AS BIGINT) AS bucket
       |  FROM toks, b),
       |wb AS (
       |  SELECT bucket, n_tokens,
       |         row_number() OVER (PARTITION BY bucket
       |                            ORDER BY n_tokens, doc_id) AS rn
       |  FROM bucketed)
       |SELECT bucket,
       |       CAST((rn - 1) // $BatchSize AS BIGINT) AS batch_id,
       |       count(*) AS n_docs,
       |       min(n_tokens) AS min_len,
       |       max(n_tokens) AS max_len,
       |       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |       CAST(max(n_tokens) * count(*) - sum(n_tokens) AS DOUBLE)
       |         / CAST(max(n_tokens) * count(*) AS DOUBLE) AS padding_frac
       |FROM wb
       |GROUP BY bucket, CAST((rn - 1) // $BatchSize AS BIGINT)
       |ORDER BY bucket, batch_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x80_length_bucket_batches" -> lengthBucketBatches _)

  val oracles: Map[String, String] = Map(
    "x80_length_bucket_batches" -> lengthBucketBatchesSql)
}
