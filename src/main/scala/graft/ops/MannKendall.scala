package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X171 — Mann–Kendall trend test + Sen's slope: per event type, the
  * classical NONPARAMETRIC monotone-trend statistics of its daily
  * volume series (Mann 1945, Kendall 1975; Sen 1968) — the
  * feed-health reading that complements X99's parametric per-user OLS
  * the way X170 complements X117/X141/X163 on the drift axis: S reads
  * trend DIRECTION robustly to any monotone transform and to
  * outliers, Sen's slope is the robust magnitude (median pairwise
  * slope — one rogue burst day cannot move it), and the emitted
  * tie-corrected variance (×18) lets a consumer form the z test.
  *
  * Exactness: the daily series is X99's dense spine (silent days = 0)
  * — exact i64 counts on day indexes; S = Σ_{i<j} sign(y_j − y_i) is
  * an exact i64 over the day-pair set; var18 = n(n−1)(2n+5) −
  * Σ_t t(t−1)(2t+5) (the tie-corrected variance with the /18 cleared)
  * is exact i64 from value-tie multiplicities; Sen's slope is the
  * median of pairwise rationals dy/dx — each slope a double of
  * identical i64 operands (identical in both engines), the median
  * picked by rank over the total order (slope, dy, dx) and, for even
  * pair counts, the average of the two middle values (ONE two-operand
  * add — commutative and deterministic — and one halving). No z
  * column by design: z needs s/√(var18/18) with a continuity
  * correction — one sqrt of a division both engines could sequence
  * differently inside a larger expression; s and var18 carry the
  * exact ingredients instead.
  *
  * Scale shape: one (type, day) map-side-combined aggregate; the day
  * spine and the pair set are TIME-bounded (|days| per span; pairs =
  * C(|days|, 2) per type — calendar-bounded, never corpus-bounded),
  * so the per-type rank window for the median runs over bounded rows;
  * |types| output rows. The corpus is touched exactly once.
  *
  * Reference scope: no trend analytics in the reference; engine
  * extension (SURVEY §2.5, the X94/X99/X124/X126 activity family).
  */
object MannKendall {

  def mannKendall(spark: SparkSession, dir: String): DataFrame =
    mkOf(Tables.events(spark, dir))

  /** Core of X171 over any (event_type, ts) frame; test seam. */
  private[graft] def mkOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val daily = events
      .groupBy($"event_type", to_date($"ts").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val span = daily.groupBy($"event_type")
      .agg(min($"day").as("d0"), max($"day").as("d1"))
    val spine = span.select($"event_type", $"d0",
      explode(sequence($"d0", $"d1")).as("day"))
    val xy = spine.join(daily, Seq("event_type", "day"), "left")
      .select($"event_type",
        datediff($"day", $"d0").cast("long").as("x"),
        coalesce($"cnt", lit(0L)).as("y"))
    val pairs = xy.as("a").join(xy.as("b"),
        col("a.event_type") === col("b.event_type") &&
          col("a.x") < col("b.x"))
      .select(col("a.event_type").as("event_type"),
        (col("b.y") - col("a.y")).as("dy"),
        (col("b.x") - col("a.x")).as("dx"))
    val sAgg = pairs.groupBy($"event_type")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when($"dy" > 0, 1L).when($"dy" < 0, -1L).otherwise(0L))
          .as("s_stat"))
    // Sen: rank the pairwise slopes over a TOTAL order (the double
    // slope is identical in both engines; dy, dx break exact ties) and
    // average the middle one or two
    val byType = Window.partitionBy($"event_type")
      .orderBy($"slope".asc, $"dy".asc, $"dx".asc)
    val sen = pairs
      .withColumn("slope", $"dy".cast("double") / $"dx".cast("double"))
      .withColumn("rn", row_number().over(byType).cast("long"))
      .join(sAgg.select($"event_type", $"n_pairs"), Seq("event_type"))
      .filter($"rn" === expr("(n_pairs + 1) div 2") ||
        $"rn" === expr("(n_pairs + 2) div 2"))
      .groupBy($"event_type")
      .agg((sum($"slope") / count(lit(1)).cast("double")).as("sen_slope"))
    val ties = xy.groupBy($"event_type", $"y").agg(count(lit(1)).as("t"))
      .groupBy($"event_type")
      .agg(sum($"t" * ($"t" - 1L) * (lit(2L) * $"t" + lit(5L)))
        .as("tie18"))
    xy.groupBy($"event_type")
      .agg(count(lit(1)).as("n_days"), sum($"y").as("total_events"))
      .join(sAgg.select($"event_type", $"s_stat"), Seq("event_type"), "left")
      .join(ties, Seq("event_type"))
      .join(sen, Seq("event_type"), "left")
      .select($"event_type", $"n_days", $"total_events",
        coalesce($"s_stat", lit(0L)).as("s_stat"),
        ($"n_days" * ($"n_days" - lit(1L)) *
          (lit(2L) * $"n_days" + lit(5L)) - $"tie18").as("var18"),
        $"sen_slope")
      .orderBy($"event_type")
  }

  val mannKendallSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |span AS (
      |  SELECT event_type, min(day) AS d0, max(day) AS d1
      |  FROM daily GROUP BY 1),
      |spine AS (
      |  SELECT s.event_type, s.d0, CAST(g.g AS DATE) AS day
      |  FROM span s,
      |       LATERAL (SELECT unnest(generate_series(
      |         s.d0, s.d1, INTERVAL 1 DAY)) AS g) g),
      |xy AS (
      |  SELECT s.event_type,
      |         date_diff('day', s.d0, s.day) AS x,
      |         coalesce(d.cnt, 0) AS y
      |  FROM spine s LEFT JOIN daily d
      |    ON s.event_type = d.event_type AND s.day = d.day),
      |pairs AS (
      |  SELECT a.event_type, b.y - a.y AS dy, b.x - a.x AS dx
      |  FROM xy a JOIN xy b
      |    ON a.event_type = b.event_type AND a.x < b.x),
      |sagg AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
      |         CAST(sum(CASE WHEN dy > 0 THEN 1
      |                       WHEN dy < 0 THEN -1 ELSE 0 END) AS BIGINT)
      |           AS s_stat
      |  FROM pairs GROUP BY 1),
      |sen AS (
      |  SELECT r.event_type,
      |         sum(r.slope) / count(*) AS sen_slope
      |  FROM (SELECT p.event_type,
      |               CAST(p.dy AS DOUBLE) / p.dx AS slope, p.dy, p.dx,
      |               row_number() OVER (PARTITION BY p.event_type
      |                 ORDER BY CAST(p.dy AS DOUBLE) / p.dx ASC,
      |                          p.dy ASC, p.dx ASC) AS rn
      |        FROM pairs p) r
      |  JOIN sagg ON r.event_type = sagg.event_type
      |  WHERE r.rn = (sagg.n_pairs + 1) // 2
      |     OR r.rn = (sagg.n_pairs + 2) // 2
      |  GROUP BY 1),
      |ties AS (
      |  SELECT event_type,
      |         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie18
      |  FROM (SELECT event_type, y, count(*) AS t
      |        FROM xy GROUP BY 1, 2)
      |  GROUP BY 1),
      |base AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |         CAST(sum(y) AS BIGINT) AS total_events
      |  FROM xy GROUP BY 1)
      |SELECT base.event_type, base.n_days, base.total_events,
      |       coalesce(sagg.s_stat, 0) AS s_stat,
      |       base.n_days * (base.n_days - 1) * (2 * base.n_days + 5)
      |         - ties.tie18 AS var18,
      |       sen.sen_slope
      |FROM base
      |LEFT JOIN sagg ON base.event_type = sagg.event_type
      |JOIN ties ON base.event_type = ties.event_type
      |LEFT JOIN sen ON base.event_type = sen.event_type
      |ORDER BY base.event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x171_mann_kendall" -> mannKendall _)

  val oracles: Map[String, String] = Map(
    "x171_mann_kendall" -> mannKendallSql)
}
