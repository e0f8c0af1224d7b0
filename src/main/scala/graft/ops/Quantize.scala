package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X48 — scalar int8 quantization of embeddings: per-dimension
  * min/max calibration over the corpus, then each 64-float vector
  * compresses to 64 one-byte codes (4× over float32, 8× over float64 —
  * the storage/IO side of vector search, complementing X31's PQ which
  * compresses for DISTANCE computation). Output carries the codes and
  * a quantized reconstruction-error norm per vector.
  *
  * Scale shape: calibration is one posexplode + (dim) partial agg to
  * exactly |dims| rows, folded into TWO in-plan arrays (sorted by dim)
  * that broadcast to the encode pass; the encode itself is row-local
  * array arithmetic (transform + aggregate HOFs) — map-only over the
  * corpus, no second shuffle. At 100 TB the calibration pass reads the
  * embedding column once and the encode rides the scan's splits.
  *
  * Parity: every arithmetic step — (x−mn)·255/(mx−mn), floor, clamp,
  * the mid-riser reconstruction mn+(code+½)·(mx−mn)/255, and the
  * per-term `floor(|x−recon|·1e7)` i64 error quantization — evaluates
  * on bit-identical doubles in both engines; the error SUM is an i64
  * sum (order-free). Constant dimensions (mx = mn) encode as 0 with
  * zero error by definition — the div-by-zero guard both engines
  * apply identically.
  */
object Quantize {

  val Levels = 255

  def embeddingQuantization(spark: SparkSession, dir: String): DataFrame =
    quantizeOf(Tables.embeddings(spark, dir))

  /** Core of X48 over any (vec_id, embedding: array<float>) frame. */
  def quantizeOf(emb: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val expl = emb
      .select(posexplode($"embedding").as(Seq("pos", "xf")))
      .select($"pos", $"xf".cast("double").as("x"))
    val stats = expl.groupBy($"pos")
      .agg(min($"x").as("mn"), max($"x").as("mx"))
    val statsArr = stats
      .agg(sort_array(collect_list(struct($"pos", $"mn"))).as("mns"),
        sort_array(collect_list(struct($"pos", $"mx"))).as("mxs"))
      .select(transform($"mns", s => s.getField("mn")).as("mn_arr"),
        transform($"mxs", s => s.getField("mx")).as("mx_arr"))

    def mnAt(i: org.apache.spark.sql.Column) = element_at($"mn_arr", i + 1)
    def mxAt(i: org.apache.spark.sql.Column) = element_at($"mx_arr", i + 1)
    def codeOf(xf: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val x = xf.cast("double")
      when(mxAt(i) === mnAt(i), lit(0L))
        .otherwise(least(lit(Levels.toLong),
          floor((x - mnAt(i)) * Levels / (mxAt(i) - mnAt(i))).cast("long")))
    }
    def errOf(xf: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) = {
      val x = xf.cast("double")
      val recon = when(mxAt(i) === mnAt(i), mnAt(i))
        .otherwise(mnAt(i) +
          (codeOf(xf, i).cast("double") + 0.5) * (mxAt(i) - mnAt(i)) / Levels)
      floor(abs(x - recon) * 1e7).cast("long")
    }
    emb.crossJoin(broadcast(statsArr))
      .select($"vec_id",
        to_json(transform($"embedding", (xf, i) => codeOf(xf, i))).as("codes"),
        aggregate(transform($"embedding", (xf, i) => errOf(xf, i)),
          lit(0L), (acc, e) => acc + e).as("err_q"))
      .orderBy($"vec_id")
  }

  val embeddingQuantizationSql: String =
    s"""WITH tok AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
       |         CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |st AS (
       |  SELECT pos, min(x) AS mn, max(x) AS mx FROM tok GROUP BY pos),
       |enc AS (
       |  SELECT t.vec_id, t.pos,
       |         CASE WHEN s.mx = s.mn THEN 0
       |              ELSE CAST(least($Levels,
       |                floor((t.x - s.mn) * $Levels / (s.mx - s.mn))) AS BIGINT)
       |         END AS code,
       |         t.x, s.mn, s.mx
       |  FROM tok t JOIN st s ON t.pos = s.pos),
       |err AS (
       |  SELECT vec_id, pos, code,
       |         CAST(floor(abs(x - CASE WHEN mx = mn THEN mn
       |           ELSE mn + (CAST(code AS DOUBLE) + 0.5) * (mx - mn) / $Levels
       |           END) * 1e7) AS BIGINT) AS e
       |  FROM enc)
       |SELECT vec_id,
       |       to_json(list(code ORDER BY pos)) AS codes,
       |       CAST(sum(e) AS BIGINT) AS err_q
       |FROM err
       |GROUP BY vec_id
       |ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x48_embedding_quantization" -> embeddingQuantization _)

  val oracles: Map[String, String] = Map(
    "x48_embedding_quantization" -> embeddingQuantizationSql)
}
