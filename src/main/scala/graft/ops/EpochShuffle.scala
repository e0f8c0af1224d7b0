package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X42 — deterministic epoch shuffle: the global training-order
  * randomization a data loader needs before each epoch, laid out as
  * shards. Every document gets, for a given epoch number:
  *
  *   - `shard = md5Long40(doc_id ‖ ":s" ‖ epoch) % NumShards` — which
  *     output shard (file) it lands in, and
  *   - `pos`   — its position inside the shard, the rank of
  *     `md5Long40(doc_id ‖ ":o" ‖ epoch)` (doc_id tiebreak).
  *
  * Both are pure functions of (doc_id, epoch): the permutation is
  * reproducible across runs, retries, and engines — no `rand()`, no
  * dependence on partitioning — and changing the epoch number yields an
  * unrelated permutation with zero coordination.
  *
  * Scale shape: this is how you shuffle 100 TB for training WITHOUT a
  * global sort. One hash exchange on `shard` co-locates each shard,
  * then the rank is a per-shard sort of ~N/NumShards rows — the work is
  * NumShards independent local sorts, never a single total order. The
  * registered query's trailing ORDER BY is only the oracle-determinism
  * output sort; the write-side seam [[epochShuffleWrite]] skips it and
  * writes `repartition(shard).sortWithinPartitions(ord)` directly —
  * shard boundaries are hash-stable, so an epoch is re-creatable
  * shard-by-shard after any failure.
  */
object EpochShuffle {

  val NumShards = 64

  /** Shard + in-shard position for one epoch of the documents table. */
  def epochShuffle(spark: SparkSession, dir: String): DataFrame =
    shuffleOf(Tables.documents(spark, dir), epoch = 1, NumShards)

  /** Core of X42 over any frame with a doc_id column; test seam. */
  def shuffleOf(docs: DataFrame, epoch: Int, shards: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(shards > 0, s"need shards > 0, got $shards")
    val keyed = docs
      .withColumn("shard",
        Hashing.md5Long40(concat($"doc_id".cast("string"), lit(s":s$epoch")))
          % shards)
      .withColumn("ord",
        Hashing.md5Long40(concat($"doc_id".cast("string"), lit(s":o$epoch"))))
    keyed
      .withColumn("pos",
        row_number().over(
          Window.partitionBy($"shard").orderBy($"ord".asc, $"doc_id".asc))
          .cast("long"))
      .select($"doc_id", $"shard", $"pos")
      .orderBy($"shard", $"pos")
  }

  /** Write-side seam: materialize one epoch as NumShards shard files,
    * each internally in shuffled order — the layout a sequential loader
    * streams. No global sort and no window: the hash exchange places
    * rows, the local sort orders them, every file is independently
    * reproducible.
    */
  def epochShuffleWrite(docs: DataFrame, epoch: Int, shards: Int,
                        outPath: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .withColumn("shard",
        Hashing.md5Long40(concat($"doc_id".cast("string"), lit(s":s$epoch")))
          % shards)
      .withColumn("ord",
        Hashing.md5Long40(concat($"doc_id".cast("string"), lit(s":o$epoch"))))
      .repartition(shards, $"shard")
      .sortWithinPartitions($"ord".asc, $"doc_id".asc)
      .write.mode("overwrite").parquet(outPath)
  }

  def epochShuffleSql(epoch: Int, shards: Int): String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         ${Hashing.sqlMd5Long40(s"CAST(doc_id AS VARCHAR) || ':s$epoch'")}
       |           % $shards AS shard,
       |         ${Hashing.sqlMd5Long40(s"CAST(doc_id AS VARCHAR) || ':o$epoch'")}
       |           AS ord
       |  FROM documents)
       |SELECT doc_id, shard,
       |       CAST(row_number() OVER (PARTITION BY shard
       |         ORDER BY ord ASC, doc_id ASC) AS BIGINT) AS pos
       |FROM k
       |ORDER BY shard, pos""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x42_epoch_shuffle" -> epochShuffle _)

  val oracles: Map[String, String] = Map(
    "x42_epoch_shuffle" -> epochShuffleSql(1, NumShards))
}
