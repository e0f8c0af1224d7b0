package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X133 — exact lagged cross-correlation of two event-type daily
  * series: does `view` traffic LEAD `purchase` traffic, and by how
  * many days? — the lead/lag diagnostic behind funnel latency and
  * anomaly root-causing (X76 correlates types at lag 0 per user; X38
  * follows individual users through a funnel; X133 asks the
  * population-level timing question the other two can't: at which
  * shift ℓ does corr(x_t, y_{t+ℓ}) peak).
  *
  * Exactness — per lag ℓ ∈ [−L, L], over the n_ℓ = |spine| − |ℓ|
  * aligned day pairs of the dense global day spine (silent days are
  * explicit 0 — the X94/X99 spine stance):
  *
  *   r_num = n·Σxy − Σx·Σy,  sxx = n·Σx² − (Σx)²,  syy likewise
  *
  * all exact i64 (day counts are corpus-bounded; the marginals are
  * recomputed per lag over exactly the aligned window — at ℓ ≠ 0 they
  * differ from the full-series marginals, and using the latter is the
  * classic windowed-correlation bug), ρ = num/√(sxx·syy) as the one
  * X116-style double. A constant-on-the-window series defines ρ = 0.
  *
  * Scale shape: daily counts are ONE (type, day) aggregate with
  * map-side partials (types × days rows — tiny at any corpus scale);
  * the lag alignment is a (2L+1)-row broadcast cross join with a
  * date_add equi-join on the day spine; one lag-keyed aggregate after.
  * The corpus is touched once. Output is 2L+1 rows.
  *
  * Reference scope: no analytics in the reference; engine extension
  * (SURVEY §2.5, the X38/X76/X94/X99 activity family).
  */
object LaggedXcorr {

  val MaxLag = 3
  val TypeX = "view"
  val TypeY = "purchase"

  def viewPurchaseXcorr(spark: SparkSession, dir: String): DataFrame =
    xcorrOf(Tables.events(spark, dir), TypeX, TypeY)

  /** Core of X133 over any (ts, event_type) frame; test seam. */
  private[graft] def xcorrOf(events: DataFrame, tx: String,
      ty: String): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .filter($"event_type".isin(tx, ty))
      .groupBy(to_date($"ts").as("day"), $"event_type")
      .agg(count(lit(1)).as("c"))
    val span = events.agg(min(to_date($"ts")).as("d0"),
      max(to_date($"ts")).as("d1"))
    val spine = span.select(
      explode(sequence($"d0", $"d1")).as("day"))
    val series = spine
      .join(daily.filter($"event_type" === tx)
        .select($"day", $"c".as("x")), Seq("day"), "left")
      .join(daily.filter($"event_type" === ty)
        .select($"day", $"c".as("y")), Seq("day"), "left")
      .select($"day", coalesce($"x", lit(0L)).as("x"),
        coalesce($"y", lit(0L)).as("y"))
      .localCheckpoint()
    val lags = (-MaxLag to MaxLag).map(_.toLong).toDF("lag")
    series.as("a").crossJoin(broadcast(lags))
      .join(series.as("b"),
        expr("b.day = date_add(a.day, CAST(lag AS INT))"))
      .select($"lag", col("a.x").as("x"), col("b.y").as("y"))
      .groupBy($"lag")
      .agg(count(lit(1)).as("n_days"),
        (count(lit(1)) * sum($"x" * $"y") - sum($"x") * sum($"y"))
          .as("r_num"),
        (count(lit(1)) * sum($"x" * $"x") - sum($"x") * sum($"x"))
          .as("sxx"),
        (count(lit(1)) * sum($"y" * $"y") - sum($"y") * sum($"y"))
          .as("syy"))
      .withColumn("r_q",
        when($"sxx" > 0 && $"syy" > 0,
          $"r_num".cast("double") /
            sqrt($"sxx".cast("double") * $"syy".cast("double")))
          .otherwise(lit(0.0)))
      .orderBy($"lag")
  }

  val viewPurchaseXcorrSql: String =
    s"""WITH daily AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS c
       |  FROM events WHERE event_type IN ('$TypeX', '$TypeY')
       |  GROUP BY 1, 2),
       |span AS (SELECT min(CAST(ts AS DATE)) AS d0,
       |                max(CAST(ts AS DATE)) AS d1 FROM events),
       |spine AS (
       |  SELECT CAST(g.g AS DATE) AS day
       |  FROM span, LATERAL (SELECT unnest(generate_series(
       |    span.d0, span.d1, INTERVAL 1 DAY)) AS g) g),
       |series AS (
       |  SELECT s.day, coalesce(dx.c, 0) AS x, coalesce(dy.c, 0) AS y
       |  FROM spine s
       |  LEFT JOIN daily dx ON dx.day = s.day AND dx.event_type = '$TypeX'
       |  LEFT JOIN daily dy ON dy.day = s.day AND dy.event_type = '$TypeY'),
       |lags AS (SELECT CAST(unnest(generate_series(-$MaxLag, $MaxLag))
       |           AS BIGINT) AS lag),
       |al AS (
       |  SELECT l.lag, a.x, b.y
       |  FROM series a CROSS JOIN lags l
       |  JOIN series b ON b.day = a.day + CAST(l.lag AS INTEGER)),
       |agg AS (
       |  SELECT lag, count(*) AS n_days,
       |         count(*) * sum(x * y) - sum(x) * sum(y) AS r_num,
       |         count(*) * sum(x * x) - sum(x) * sum(x) AS sxx,
       |         count(*) * sum(y * y) - sum(y) * sum(y) AS syy
       |  FROM al GROUP BY lag)
       |SELECT lag, CAST(n_days AS BIGINT) AS n_days,
       |       CAST(r_num AS BIGINT) AS r_num,
       |       CAST(sxx AS BIGINT) AS sxx, CAST(syy AS BIGINT) AS syy,
       |       CASE WHEN sxx > 0 AND syy > 0
       |            THEN CAST(r_num AS DOUBLE)
       |                   / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))
       |            ELSE 0.0 END AS r_q
       |FROM agg
       |ORDER BY lag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x133_lagged_xcorr" -> viewPurchaseXcorr _)

  val oracles: Map[String, String] = Map(
    "x133_lagged_xcorr" -> viewPurchaseXcorrSql)
}
