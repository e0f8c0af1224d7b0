package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Hashing, KmvSketch}

/** X139 — X134's KMV sketch re-expressed as the PRODUCTION aggregate:
  * a bounded typed Aggregator ([[graft.functions.KmvSketch]], the B56
  * argument applied to sketches) instead of a rank window. The window
  * form shuffles every distinct hash to its group's partition; the
  * aggregator runs partial → final with a ≤K-slot buffer, shipping at
  * most K hashes per (group, partition) — the shape that survives a
  * 100 TB corpus and the shape a STREAMING aggregation can maintain
  * incrementally (stream/StreamKmv.scala runs this exact aggregate in
  * complete mode; StreamKmvSpec pins streamed ≡ batch across
  * micro-batch boundaries with one bounded state row per source).
  *
  * Dedup lives inside the aggregator (a stream cannot afford an
  * upstream distinct — unbounded state), so this query feeds RAW
  * content hashes where X134 pre-distincts. Same estimate formula,
  * same output schema, same oracle SQL as X134 — the driver's
  * hash-compare against the independently-computed DuckDB path is
  * then a cross-engine proof of the aggregator's distinct-bottom-k
  * law; KmvAggSpec additionally pins aggregator ≡ window inside the
  * engine. The n_distinct audit column is a countDistinct alongside
  * (exact, Expand-based; the production form drops it — the sketch's
  * est_q is the answer at scale).
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, closing the B11/X45/X134–X138 sketch family with its
  * production aggregation + streaming form).
  */
object KmvAgg {

  val K = Kmv.K
  /** Hash-space size of md5Long40. */
  val H = 1L << 40

  def kmvAgg(spark: SparkSession, dir: String): DataFrame =
    aggOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("text").as("v")))

  /** Core of X139 over any (grp, v) frame — raw rows, no pre-distinct. */
  private[graft] def aggOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val kmv = udaf(new KmvSketch(K))
    rows
      .select($"grp", Hashing.md5Long40($"v").as("h"))
      .groupBy($"grp")
      .agg(countDistinct($"h").as("n_distinct"),
        kmv($"h").as("ks"))
      .select($"grp", $"n_distinct",
        size($"ks").cast("long").as("k_used"),
        element_at($"ks", size($"ks")).as("kth_hash"))
      .withColumn("est_q",
        when($"n_distinct" < K, $"n_distinct".cast("double"))
          .otherwise((lit((K - 1).toDouble) * lit(H.toDouble)) /
            $"kth_hash".cast("double")))
      .orderBy($"grp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x139_kmv_agg" -> kmvAgg _)

  /** Same oracle as X134 — the SQL path is the independent direct
    * computation the aggregator must reproduce bit-for-bit.
    */
  val oracles: Map[String, String] = Map(
    "x139_kmv_agg" -> Kmv.kmvDistinctContentSql)
}
