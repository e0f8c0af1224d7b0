package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X38 — funnel analysis: how many users complete the ordered sequence
  * view → click → purchase, each step within [[StepHours]] hours of the
  * previous step's completion — the classic event-sequence query of
  * product analytics, and an operator family (ordered sequence matching
  * per entity) the relational core doesn't otherwise exercise.
  *
  * Semantics per user (event time order, ties broken by event_id):
  * t1 = first view; t2 = first click after the first-view-so-far and
  * within the step window of it; t3 = first purchase likewise after t2.
  * Output: one row per stage with user counts and conversion rates.
  *
  * Scale shape — ONE shuffle: the three stage timestamps are running
  * conditional mins over the SAME window spec (user_id, ordered by
  * event time, unbounded-preceding frame), so Catalyst stacks three
  * Window operators on a single exchange+sort; the per-user rollup
  * reuses that partitioning (no second shuffle of the event stream),
  * and everything after is scalar-sized. Contrast the textbook
  * three-way self-join funnel: three shuffles of the full event table
  * and a quadratic blowup on hot users. Running conditional mins
  * reference the PRECEDING stage's running value row-locally — the
  * dependency chains through stacked windows, never through a join.
  *
  * Conversion rates divide identical i64 counts in IEEE double on both
  * engines — parity-safe, same rule as x36's mean.
  */
object Funnel {

  val StepHours = 24
  private val stages = Seq("view", "click", "purchase")

  def funnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir), StepHours)

  /** Per-user stage completion times (t1/t2/t3, null where the funnel
    * stalled) — the batch reference for X38 and the parity oracle for
    * the streaming funnel (stream/StreamFunnel.scala).
    */
  private[graft] def stageTimes(events: DataFrame, stepHours: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = expr(s"INTERVAL $stepHours HOURS")
    val staged = events
      .select($"user_id", $"ts", $"event_type", $"event_id")
      .withColumn("t1",
        min(when($"event_type" === stages(0), $"ts")).over(w))
      .withColumn("t2",
        min(when($"event_type" === stages(1) && $"t1".isNotNull &&
          $"ts" > $"t1" && $"ts" <= $"t1" + step, $"ts")).over(w))
      .withColumn("t3",
        min(when($"event_type" === stages(2) && $"t2".isNotNull &&
          $"ts" > $"t2" && $"ts" <= $"t2" + step, $"ts")).over(w))
    staged.groupBy($"user_id")
      .agg(min($"t1").as("t1"), min($"t2").as("t2"), min($"t3").as("t3"))
  }

  /** Core of X38 over any (user_id, ts, event_type, event_id) frame. */
  def funnelOf(events: DataFrame, stepHours: Int): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val perUser = stageTimes(events, stepHours)
    val counts = perUser.agg(
      count(lit(1)).as("n_total"),
      count($"t1").as("n1"), count($"t2").as("n2"), count($"t3").as("n3"))
    counts.select(explode(array(
        struct(lit("1_view").as("stage"), $"n1".as("n_users"),
          $"n_total".as("prev"), $"n1".as("first0")),
        struct(lit("2_click").as("stage"), $"n2".as("n_users"),
          $"n1".as("prev"), $"n1".as("first0")),
        struct(lit("3_purchase").as("stage"), $"n3".as("n_users"),
          $"n2".as("prev"), $"n1".as("first0")))).as("s"))
      .select($"s.stage".as("stage"), $"s.n_users".as("n_users"),
        ($"s.n_users".cast("double") /
          nullif($"s.prev", lit(0L))).as("conv_from_prev"),
        ($"s.n_users".cast("double") /
          nullif($"s.first0", lit(0L))).as("conv_from_first"))
      .orderBy($"stage")
  }

  val funnelSql: String =
    s"""WITH w1 AS (
       |  SELECT user_id, ts, event_type, event_id,
       |         min(CASE WHEN event_type = 'view' THEN ts END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS t1
       |  FROM events),
       |w2 AS (
       |  SELECT user_id, ts, event_type, event_id, t1,
       |         min(CASE WHEN event_type = 'click' AND t1 IS NOT NULL
       |                   AND ts > t1 AND ts <= t1 + INTERVAL $StepHours HOUR
       |                  THEN ts END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS t2
       |  FROM w1),
       |w3 AS (
       |  SELECT user_id, ts, event_type, t1, t2,
       |         min(CASE WHEN event_type = 'purchase' AND t2 IS NOT NULL
       |                   AND ts > t2 AND ts <= t2 + INTERVAL $StepHours HOUR
       |                  THEN ts END)
       |           OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                 ROWS UNBOUNDED PRECEDING) AS t3
       |  FROM w2),
       |per_user AS (
       |  SELECT user_id, min(t1) AS t1, min(t2) AS t2, min(t3) AS t3
       |  FROM w3 GROUP BY user_id),
       |c AS (
       |  SELECT count(*) AS n_total,
       |         count(t1) AS n1, count(t2) AS n2, count(t3) AS n3
       |  FROM per_user)
       |SELECT s.stage, s.n_users,
       |       CAST(s.n_users AS DOUBLE) / nullif(s.prev, 0) AS conv_from_prev,
       |       CAST(s.n_users AS DOUBLE) / nullif(s.first0, 0) AS conv_from_first
       |FROM c, LATERAL (VALUES
       |  ('1_view', n1, n_total, n1),
       |  ('2_click', n2, n1, n1),
       |  ('3_purchase', n3, n2, n1)) AS s(stage, n_users, prev, first0)
       |ORDER BY stage""".stripMargin

  /** X39 — cohort retention: group users by first-activity day (their
    * cohort) and report, for every day offset, how many of the cohort
    * were active again — the standard retention triangle.
    *
    * Scale shape: cohort assignment is one partial-aggregated groupBy
    * on user_id (map-side min); activity joins the cohort frame on the
    * SAME user_id partitioning (no broadcast assumed — user count
    * scales with the data); the triangle aggregation runs over
    * (cohort, offset, user) distinct rows, which the two-phase distinct
    * rewrite dedups map-side. The cohort-size denominator comes from a
    * window over the aggregated triangle (cohorts × offsets rows — tiny
    * at any input scale), not a second pass over the events.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortsOf(Tables.events(spark, dir))

  def cohortsOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val act = events.select($"user_id", to_date($"ts").as("day"))
    val cohorts = act.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val triangle = act.join(cohorts, "user_id")
      .groupBy($"cohort_day",
        datediff($"day", $"cohort_day").cast("long").as("offset_days"))
      .agg(countDistinct($"user_id").as("n_active"))
    val byCohort = Window.partitionBy($"cohort_day")
    triangle
      .withColumn("cohort_size",
        max(when($"offset_days" === 0, $"n_active")).over(byCohort))
      .select($"cohort_day", $"offset_days", $"n_active",
        ($"n_active".cast("double") / $"cohort_size").as("retention"))
      .orderBy($"cohort_day", $"offset_days")
  }

  val cohortRetentionSql: String =
    """WITH act AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohorts AS (
      |  SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id),
      |triangle AS (
      |  SELECT c.cohort_day,
      |         CAST(a.day - c.cohort_day AS BIGINT) AS offset_days,
      |         count(DISTINCT a.user_id) AS n_active
      |  FROM act a JOIN cohorts c ON a.user_id = c.user_id
      |  GROUP BY 1, 2)
      |SELECT cohort_day, offset_days, n_active,
      |       CAST(n_active AS DOUBLE) /
      |         max(CASE WHEN offset_days = 0 THEN n_active END)
      |           OVER (PARTITION BY cohort_day) AS retention
      |FROM triangle
      |ORDER BY cohort_day, offset_days""".stripMargin

  /** X40 — event transition matrix: for every ordered pair of event
    * types, how often one immediately follows the other within a user's
    * event stream, with per-source transition probabilities — the
    * Markov-chain view of user paths (the aggregate form of path
    * analysis, feeding funnel design and anomaly detection).
    *
    * Scale shape: `lead` over the same user-keyed window spec as X38
    * (one exchange+sort of the events), then a partial-aggregated
    * groupBy on the (from, to) pair — |event_types|² rows out of the
    * map side regardless of input size; the probability normalization
    * windows over THAT tiny aggregate, never the event stream.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame =
    transitionsOf(Tables.events(spark, dir))

  def transitionsOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val byFrom = Window.partitionBy($"from_type")
    events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        $"n".cast("double") / sum($"n").over(byFrom))
      .orderBy($"from_type", $"to_type")
  }

  val eventTransitionsSql: String =
    """WITH t AS (
      |  SELECT user_id, event_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |agg AS (
      |  SELECT event_type AS from_type, next_type AS to_type,
      |         count(*) AS n
      |  FROM t WHERE next_type IS NOT NULL
      |  GROUP BY 1, 2)
      |SELECT from_type, to_type, n,
      |       CAST(n AS DOUBLE) /
      |         CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS p
      |FROM agg
      |ORDER BY from_type, to_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x38_funnel" -> funnel _,
    "x39_cohort_retention" -> cohortRetention _,
    "x40_event_transitions" -> eventTransitions _)

  val oracles: Map[String, String] = Map(
    "x38_funnel" -> funnelSql,
    "x39_cohort_retention" -> cohortRetentionSql,
    "x40_event_transitions" -> eventTransitionsSql)
}
