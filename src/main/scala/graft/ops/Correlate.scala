package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X76 — pairwise activity correlation: Pearson r between every pair of
  * event types' hourly count series — "do purchases move with clicks?",
  * the co-movement matrix a monitoring/causal-screening pass reads
  * (complements x44's PMI, which correlates co-occurrence WITHIN a
  * user, with the population-level time view).
  *
  * Correctness hinges on the DENSE grid: hours where a type is silent
  * count as 0 (skipping them biases r toward +1), so the series is the
  * full [min, max] hour range per type — built in-plan from a one-row
  * min/max aggregate exploded to hour indexes (i64 µs÷3600e6, exact)
  * cross-joined with the broadcast type list, never a driver collect.
  *
  * Scale shape: the fact stream collapses to (hour, type) counts FIRST
  * (two-phase; the only fact-volume shuffle); the grid is
  * timeline×|types| rows — time-bound, not data-bound; the pair build
  * is an hour-keyed equi-self-join (co-partitioned, fan-out |types|²
  * per hour, a fixed small domain) feeding one partial-aggregable
  * moment aggregate per pair. Moments n·Σxy ≤ |hours|²·max_cnt² fit
  * i64 here; the DECIMAL(38,0) swap past ~1e9 hour·count products is
  * the b46/x64 rule.
  *
  * Parity: every moment is an exact i64 sum; r's numerator and the two
  * variance terms are i64 arithmetic; sqrt is IEEE-correctly-rounded
  * (unlike libm transcendentals — no rounding guard needed), and the
  * final expression combines identical doubles in a fixed order, so r
  * is bit-exact. Zero-variance series (constant counts) emit NULL via
  * an exact integer test, not a NaN.
  */
object Correlate {

  def typeCorrelation(spark: SparkSession, dir: String): DataFrame =
    typeCorrelationOf(Tables.events(spark, dir))

  /** X76 over any events-shaped frame — ScaleBench seam. */
  private[graft] def typeCorrelationOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    // `div`, not `/`: Column `/` is DOUBLE division, whose rounded
    // quotient can truncate into the wrong hour bucket at 1e15-µs
    // magnitudes; `div` is exact i64 division like DuckDB's `//`
    val ev = events
      .select(expr("unix_micros(ts) div 3600000000").as("hr"),
        $"event_type")
    val counts = ev.groupBy($"hr", $"event_type").agg(count(lit(1)).as("cnt"))
    val hours = ev.agg(min($"hr").as("h0"), max($"hr").as("h1"))
      .select(explode(sequence($"h0", $"h1")).as("hr"))
    val types = ev.select($"event_type").distinct()
    val dense = hours.crossJoin(broadcast(types))
      .join(counts, Seq("hr", "event_type"), "left")
      .select($"hr", $"event_type", coalesce($"cnt", lit(0L)).as("cnt"))
    val a = dense.withColumnsRenamed(
      Map("event_type" -> "type_a", "cnt" -> "xa"))
    val b = dense.withColumnsRenamed(
      Map("event_type" -> "type_b", "cnt" -> "xb", "hr" -> "hr_b"))
    val m = a.join(b, $"hr" === $"hr_b" && $"type_a" < $"type_b")
      .groupBy($"type_a", $"type_b")
      .agg(count(lit(1)).as("n"),
        sum($"xa").as("sx"), sum($"xb").as("sy"),
        sum($"xa" * $"xb").as("sxy"),
        sum($"xa" * $"xa").as("sxx"),
        sum($"xb" * $"xb").as("syy"))
    m.select($"type_a", $"type_b", $"n".as("n_hours"),
        when($"n" * $"sxx" - $"sx" * $"sx" === 0L ||
             $"n" * $"syy" - $"sy" * $"sy" === 0L, lit(null))
          .otherwise(
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double")
              / (sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double"))
                * sqrt(($"n" * $"syy" - $"sy" * $"sy").cast("double"))))
          .as("r"))
      .orderBy($"type_a", $"type_b")
  }

  val typeCorrelationSql: String =
    """WITH ev AS (
      |  SELECT CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hr, event_type
      |  FROM events),
      |counts AS (
      |  SELECT hr, event_type, count(*) AS cnt FROM ev GROUP BY 1, 2),
      |hours AS (
      |  SELECT unnest(generate_series(min(hr), max(hr))) AS hr FROM ev),
      |types AS (SELECT DISTINCT event_type FROM ev),
      |dense AS (
      |  SELECT h.hr, t.event_type, coalesce(c.cnt, 0) AS cnt
      |  FROM hours h CROSS JOIN types t
      |  LEFT JOIN counts c ON c.hr = h.hr AND c.event_type = t.event_type),
      |m AS (
      |  SELECT a.event_type AS type_a, b.event_type AS type_b,
      |         count(*) AS n,
      |         CAST(sum(a.cnt) AS BIGINT) AS sx,
      |         CAST(sum(b.cnt) AS BIGINT) AS sy,
      |         CAST(sum(a.cnt * b.cnt) AS BIGINT) AS sxy,
      |         CAST(sum(a.cnt * a.cnt) AS BIGINT) AS sxx,
      |         CAST(sum(b.cnt * b.cnt) AS BIGINT) AS syy
      |  FROM dense a JOIN dense b
      |    ON a.hr = b.hr AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, n AS n_hours,
      |       CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
      |            THEN NULL
      |            ELSE CAST(n * sxy - sx * sy AS DOUBLE)
      |                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
      |       END AS r
      |FROM m
      |ORDER BY type_a, type_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x76_type_correlation" -> typeCorrelation _)

  val oracles: Map[String, String] = Map(
    "x76_type_correlation" -> typeCorrelationSql)
}
