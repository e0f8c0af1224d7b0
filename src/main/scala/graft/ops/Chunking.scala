package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X33 — document chunking: split each document into overlapping
  * fixed-size token windows (the layout step before embedding /
  * retrieval indexing: every chunk carries its doc, position, and
  * text). Chunk starts step by [[Stride]] tokens; each chunk takes
  * [[ChunkSize]] tokens, so consecutive chunks overlap by
  * ChunkSize − Stride tokens and the last chunk may run short. Every
  * document produces at least one chunk (short docs → one short chunk).
  *
  * Scale shape: this is a MAP-ONLY operator — tokenize, compute the
  * chunk count, explode a chunk-index sequence, slice — all row-local
  * built-ins (no HOF lambdas, no UDFs), so it preserves the input
  * partitioning and whole-stage codegen end to end; the only exchange
  * in the registered query is the final oracle-determinism ORDER BY.
  * Output size is bounded by the overlap factor ChunkSize/Stride ≈ 1.33×
  * the input token count. All chunk arithmetic is exact integer `div`.
  */
object Chunking {

  val ChunkSize = 64
  val Stride = 48

  def docChunks(spark: SparkSession, dir: String): DataFrame =
    chunksOf(Tables.documents(spark, dir), ChunkSize, Stride)

  /** Core of X33 over any (doc_id, text) frame; test seam. */
  def chunksOf(docs: DataFrame, chunkSize: Int, stride: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    // chunk count K = 1 + ceil(max(n - size, 0) / stride): one chunk
    // covers the first `size` tokens, then one more per stride step
    // until the tail is covered
    val chunked = docs
      .withColumn("words", split(trim(lower($"text")), "\\s+"))
      .withColumn("k",
        expr(s"1 + (greatest(size(words) - $chunkSize, 0) + ${stride - 1}) div $stride"))
      .select($"doc_id", $"words",
        explode(sequence(lit(0), $"k" - 1)).as("chunk_idx"))
      .withColumn("start_tok", $"chunk_idx" * stride)
      .withColumn("piece", slice($"words", $"start_tok" + 1, lit(chunkSize)))
    chunked.select($"doc_id", $"chunk_idx".cast("long").as("chunk_idx"),
        $"start_tok".cast("long").as("start_tok"),
        size($"piece").cast("long").as("n_tok"),
        concat_ws(" ", $"piece").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val docChunksSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |k AS (
       |  SELECT doc_id, w,
       |         1 + (greatest(len(w) - $ChunkSize, 0) + ${Stride - 1}) // $Stride AS n_chunks
       |  FROM t),
       |c AS (
       |  SELECT doc_id, w, unnest(range(0, n_chunks)) AS chunk_idx
       |  FROM k)
       |SELECT doc_id,
       |       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |       CAST(chunk_idx * $Stride AS BIGINT) AS start_tok,
       |       CAST(len(w[chunk_idx * $Stride + 1 : chunk_idx * $Stride + $ChunkSize]) AS BIGINT) AS n_tok,
       |       array_to_string(w[chunk_idx * $Stride + 1 : chunk_idx * $Stride + $ChunkSize], ' ') AS chunk_text
       |FROM c
       |ORDER BY doc_id, chunk_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x33_doc_chunking" -> docChunks _)

  val oracles: Map[String, String] = Map(
    "x33_doc_chunking" -> docChunksSql)
}
