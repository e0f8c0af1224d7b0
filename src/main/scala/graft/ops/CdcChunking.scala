package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing
import graft.functions.Hashing.sqlMd5Long40

/** X58 — content-defined chunking: chunk boundaries fall AFTER any token
  * whose 40-bit hash ≡ 0 (mod [[Divisor]]), giving variable-size chunks
  * averaging [[Divisor]] tokens whose boundaries are a function of
  * CONTENT, not position. This is the storage-dedup trick (rsync/CDC
  * backup chunking) applied to corpus text, and it fixes x54's
  * structural blind spot: insert one token into a document and every
  * fixed-width tile after it shifts (all span keys change), while
  * content-defined boundaries re-synchronize at the next boundary token
  * — only the chunk containing the edit changes key. CdcChunkingSpec
  * pins exactly that resynchronization property.
  *
  * Chunk identity never materializes chunk text: a chunk keys by an
  * order-encoding exact-i64 fingerprint Σ (local_pos+1)·h(token) + n
  * (local_pos from the chunk's min token position, so the key is
  * position-independent ACROSS docs — cross-doc dedup works — while
  * remaining order-sensitive within the chunk; both engines evaluate
  * the identical integer arithmetic, and max |key| terms stay far
  * under 2⁶³). Collisions are the standard fingerprint trade, same as
  * md5-40 everywhere else in the engine.
  *
  * Scale shape: tokenize with positions (row-local), boundary flags
  * from the native md5 expression, chunk ids via a running sum over the
  * DOC-partitioned window (doc length bounds the window, never corpus
  * size), per-chunk aggregate on (doc, chunk), corpus chunk frequency
  * as a partial-aggregated groupBy on the i64 key, join back, one
  * |sources| rollup. No global window, no raw-text shuffle past the
  * first aggregate.
  */
object CdcChunking {

  /** Average tokens per chunk (boundary probability 1/Divisor). */
  val Divisor = 16

  def cdcChunking(spark: SparkSession, dir: String): DataFrame =
    cdcChunkingOf(Tables.documents(spark, dir))

  /** Core of X58 over any (doc_id, source, text) frame; test seam. */
  def cdcChunkingOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val chunks = chunksOf(docs)

    val freq = chunks.groupBy($"chunk_key").agg(count(lit(1)).as("c"))

    chunks.join(freq, Seq("chunk_key"))
      .groupBy($"source")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum($"n_tokens").as("n_tokens"),
        sum(when($"c" >= 2, 1L).otherwise(0L)).as("n_dup_chunks"),
        countDistinct($"chunk_key").as("n_distinct_chunks"))
      .withColumn("avg_chunk_tokens",
        $"n_tokens".cast("double") / $"n_chunks".cast("double"))
      .orderBy($"source")
  }

  /** Per-chunk rows (doc_id, source, chunk_id, chunk_key, n_tokens) —
    * the spec seam for the resynchronization pin.
    */
  private[graft] def chunksOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs
      .select($"doc_id", $"source",
        posexplode(split(trim(lower($"text")), "\\s+")).as(Seq("pos", "tok")))
      .withColumn("h", Hashing.md5Long40($"tok"))
      .withColumn("b", ($"h" % Divisor === 0).cast("long"))

    val byDoc = Window.partitionBy($"doc_id").orderBy($"pos")
    val chunkId = coalesce(
      sum($"b").over(byDoc.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))

    toks.withColumn("chunk_id", chunkId)
      .withColumn("p0",
        min($"pos").over(Window.partitionBy($"doc_id", $"chunk_id")))
      .groupBy($"doc_id", $"source", $"chunk_id")
      .agg(
        (sum(($"pos" - $"p0" + 1) * $"h") + count(lit(1))).as("chunk_key"),
        count(lit(1)).as("n_tokens"))
  }

  val cdcChunkingSql: String = {
    val hashExpr = sqlMd5Long40("tok")
    s"""WITH d AS (
       |  SELECT doc_id, source,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |toks AS (
       |  SELECT doc_id, source,
       |         unnest(range(len(w))) AS pos, unnest(w) AS tok
       |  FROM d),
       |hashed AS (
       |  SELECT doc_id, source, pos, $hashExpr AS h,
       |         CASE WHEN $hashExpr % $Divisor = 0 THEN 1 ELSE 0 END AS b
       |  FROM toks),
       |cid AS (
       |  SELECT doc_id, source, pos, h,
       |         CAST(coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS chunk_id
       |  FROM hashed),
       |loc AS (
       |  SELECT doc_id, source, pos, h, chunk_id,
       |         min(pos) OVER (PARTITION BY doc_id, chunk_id) AS p0
       |  FROM cid),
       |chunks AS (
       |  SELECT doc_id, source, chunk_id,
       |         CAST(sum((pos - p0 + 1) * h) + count(*) AS BIGINT)
       |           AS chunk_key,
       |         count(*) AS n_tokens
       |  FROM loc
       |  GROUP BY doc_id, source, chunk_id),
       |freq AS (SELECT chunk_key, count(*) AS c FROM chunks GROUP BY 1)
       |SELECT source,
       |       count(*) AS n_chunks,
       |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |       CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_dup_chunks,
       |       count(DISTINCT chunks.chunk_key) AS n_distinct_chunks,
       |       CAST(sum(n_tokens) AS DOUBLE) / CAST(count(*) AS DOUBLE)
       |         AS avg_chunk_tokens
       |FROM chunks JOIN freq USING (chunk_key)
       |GROUP BY source
       |ORDER BY source""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x58_cdc_chunking" -> cdcChunking _)

  val oracles: Map[String, String] = Map(
    "x58_cdc_chunking" -> cdcChunkingSql)
}
