package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.SampleSketch
import graft.functions.Hashing.md5Long40

/** X144 — X135's hash-sample quantile sketch re-expressed as the
  * PRODUCTION aggregate: a bounded typed Aggregator
  * ([[graft.functions.SampleSketch]] — the X139 move, with a value
  * payload) instead of a rank window. The window form shuffles every
  * row to its group's partition and sorts; the aggregator runs partial
  * → final with a ≤K-triple buffer, shipping at most K (hash, id,
  * value) triples per (group, partition) — the shape that survives a
  * 100 TB corpus and the shape a STREAMING aggregation can maintain
  * incrementally (stream/StreamQuantile.scala runs this exact aggregate
  * in complete mode; StreamQuantileSpec pins streamed ≡ batch across
  * micro-batch boundaries with one bounded state row per source).
  *
  * The (h, id) buffer key replicates X135's `ORDER BY h, id` tie-break
  * exactly, so the sample — and every order statistic derived from it —
  * is BIT-EQUAL to the window form's: same estimate math
  * ([[QuantileSketch.orderStatsOf]], shared), same output schema, SAME
  * oracle SQL as X135. The driver's hash-compare against the
  * independently-computed DuckDB path is then a cross-engine proof of
  * the aggregator's payload-carrying bottom-k law; SampleAggSpec
  * additionally pins aggregator ≡ window inside the engine.
  *
  * Reference scope: no sketches in the reference; engine extension
  * (SURVEY §2.5, closing the quantile corner of the sketch family the
  * way X139 closed the KMV corner).
  */
object SampleAgg {

  val K = QuantileSketch.K

  def sampleAgg(spark: SparkSession, dir: String): DataFrame =
    aggOf(Tables.documents(spark, dir).select(
      col("source").as("grp"), col("doc_id").as("id"),
      col("n_chars").as("v")))

  /** The aggregator-built sample as (grp, id, v) rows — bit-equal to
    * [[QuantileSketch.sampleOf]]; seam for the equivalence spec and the
    * production no-audit form.
    */
  private[graft] def sampleFromAgg(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val sk = udaf(new SampleSketch(K),
      ExpressionEncoder[(Long, Long, Long)]())
    rows
      .withColumn("h",
        md5Long40(concat($"id".cast("string"), lit(":qs"))))
      .groupBy($"grp")
      .agg(sk($"h", $"id", $"v").as("ks"))
      .select($"grp", explode($"ks").as("p"))
      .select($"grp", $"p._1".as("id"), $"p._2".as("v"))
  }

  /** Core of X144 over any (grp, id, v) frame; X135's output schema. */
  private[graft] def aggOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val est = QuantileSketch.orderStatsOf(sampleFromAgg(rows), "est_")
    val exact = QuantileSketch.orderStatsOf(rows, "exact_")
    exact.join(est, Seq("grp"))
      .select(Seq($"grp", $"exact_n".as("n_rows"),
        $"est_n".as("k_used")) ++
        QuantileSketch.Qs.map(q => col(s"est_p$q")) ++
        QuantileSketch.Qs.map(q => col(s"exact_p$q")): _*)
      .orderBy($"grp")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x144_sample_agg" -> sampleAgg _)

  /** Same oracle as X135 — the SQL path is the independent direct
    * computation the aggregator must reproduce bit-for-bit.
    */
  val oracles: Map[String, String] = Map(
    "x144_sample_agg" -> QuantileSketch.quantileSketchSql)
}
