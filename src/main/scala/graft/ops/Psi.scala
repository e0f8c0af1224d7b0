package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X163 — Population Stability Index: per source, the banded drift
  * score PSI = Σ_b (p_b − q_b)·ln(p_b/q_b) of ITS document-length
  * distribution against the rest of the corpus — the industry-standard
  * model-monitoring drift number (credit-risk scorecards popularized
  * it; every feature store ships it), read on the conventional bands:
  * < 0.1 stable, 0.1–0.25 shifting, > 0.25 drifted. Completes the
  * drift family's vocabulary: X117's KS is the max CDF gap (shape,
  * direction-free), X141's W₁ is the transport magnitude, X163 is the
  * banded log-ratio score practitioners alarm on; X152 streams the
  * first two.
  *
  * Banding: [[Bands]] fixed width-[[BandWidth]] length bands with an
  * overflow tail — CODE constants (the deployment-dashboard
  * convention), so the banded counts are exact i64 conditional sums in
  * ONE map-side-combined pass, cross-engine by construction. Laplace
  * +1 smoothing keeps empty bands finite and biases nothing at corpus
  * counts (the X130 convention).
  *
  * Exactness: band counts exact i64; the smoothed shares p_b, q_b are
  * double divisions of identical exact operands; ln is the one libm
  * call and each PSI term is i64-quantized (floor(term·1e9)) before
  * the cross-band sum — the x155/x156 discipline that keeps add chains
  * out of cross-engine float territory — with one division back at the
  * end. Bands are emitted wide (one row per source) so the per-band
  * evidence rides the same row as the score.
  *
  * Scale shape: ONE corpus scan, one |sources|-group aggregate with
  * 2·|bands| conditional counts riding it, a broadcast one-row total;
  * |sources| output rows.
  *
  * Reference scope: no profiling in the reference; engine extension
  * (SURVEY §2.5, the X117/X141/X152 drift family).
  */
object Psi {

  val Bands = 10
  val BandWidth = 100L

  def psiDrift(spark: SparkSession, dir: String): DataFrame =
    psiOf(Tables.documents(spark, dir)
      .select(col("source").as("grp"), col("n_chars").as("v")))

  /** Core of X163 over any (grp, v:i64) frame; test seam. */
  private[graft] def psiOf(rows: DataFrame): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val band = least(floor($"v".cast("double") / BandWidth)
      .cast("long"), lit((Bands - 1).toLong))
    val cAggs = count(lit(1)).as("n_in") +:
      (0 until Bands).map(i =>
        sum(when($"b" === i.toLong, 1L).otherwise(0L)).as(s"c$i"))
    val counted = rows
      .select($"grp", band.as("b"))
      .groupBy($"grp")
      .agg(cAggs.head, cAggs.tail: _*)
    val tAggs = sum($"n_in").as("n_all") +:
      (0 until Bands).map(i => sum(col(s"c$i")).as(s"t$i"))
    val totals = counted.agg(tAggs.head, tAggs.tail: _*)
    // smoothed shares over exact integers; each PSI term quantized to
    // i64 at 1e9 before the cross-band add chain (the x155 discipline)
    val terms = (0 until Bands).map { i =>
      val p = (col(s"c$i") + lit(1L)).cast("double") /
        ($"n_in" + lit(Bands.toLong)).cast("double")
      val q = (col(s"t$i") - col(s"c$i") + lit(1L)).cast("double") /
        ($"n_all" - $"n_in" + lit(Bands.toLong)).cast("double")
      floor((p - q) * log(p / q) * lit(1e9)).cast("long")
    }
    counted.crossJoin(broadcast(totals))
      .withColumn("psi_q", terms.reduce(_ + _))
      .select(Seq($"grp", $"n_in",
        ($"n_all" - $"n_in").as("n_rest")) ++
        (0 until Bands).map(i => col(s"c$i")) ++
        Seq(($"psi_q".cast("double") / 1e9).as("psi")): _*)
      .orderBy($"grp")
  }

  val psiDriftSql: String = {
    val cs = (0 until Bands).map(i =>
      s"CAST(sum(CASE WHEN b = $i THEN 1 ELSE 0 END) AS BIGINT) AS c$i")
      .mkString(",\n       |         ")
    val ts = (0 until Bands).map(i => s"sum(c$i) AS t$i")
      .mkString(", ")
    val terms = (0 until Bands).map { i =>
      val p = s"(CAST(c$i + 1 AS DOUBLE) / CAST(n_in + $Bands AS DOUBLE))"
      val q = s"(CAST(t$i - c$i + 1 AS DOUBLE)" +
        s" / CAST(n_all - n_in + $Bands AS DOUBLE))"
      s"CAST(floor(($p - $q) * ln($p / $q) * 1e9) AS BIGINT)"
    }.mkString("\n       |           + ")
    s"""WITH banded AS (
       |  SELECT source AS grp,
       |         least(CAST(floor(CAST(n_chars AS DOUBLE) / $BandWidth)
       |           AS BIGINT), ${Bands - 1}) AS b
       |  FROM documents),
       |c AS (
       |  SELECT grp, CAST(count(*) AS BIGINT) AS n_in,
       |         $cs
       |  FROM banded GROUP BY grp),
       |t AS (
       |  SELECT CAST(sum(n_in) AS BIGINT) AS n_all, $ts FROM c)
       |SELECT grp, n_in, n_all - n_in AS n_rest,
       |       ${(0 until Bands).map(i => s"c$i").mkString(", ")},
       |       CAST($terms
       |         AS DOUBLE) / 1e9 AS psi
       |FROM c, t
       |ORDER BY grp""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x163_psi_drift" -> psiDrift _)

  val oracles: Map[String, String] = Map(
    "x163_psi_drift" -> psiDriftSql)
}
