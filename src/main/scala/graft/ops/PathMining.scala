package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X127 — frequent behavior-path mining: the top-K length-3 event-type
  * paths by user reach — the sequential-pattern step between X40
  * (length-2 transition matrix: where do users go NEXT) and full
  * sequence assembly (X93 materializes each session's whole string):
  * length-3 is where funnels become visible as patterns
  * (view→click→purchase is a trigram) without the pattern space
  * exploding (T³ cells at T event types; counts stay aggregate-sized).
  *
  * Exactness: paths come from two stacked `lead`s on ONE per-user
  * (ts, event_id)-ordered window — the same single exchange+sort X38's
  * funnel rides; every trigram instance is counted once (position-
  * anchored, overlapping by design — the standard n-gram-over-events
  * convention, matching X49's token bigrams); reach is countDistinct
  * user. The top-K cut is a TakeOrderedAndProject with the
  * (n_users DESC, n_occurrences DESC, path ASC) total order, so the
  * limit is deterministic cross-engine.
  *
  * Scale shape: one user-keyed window (partitioned, never global), one
  * (path)-keyed aggregate with map-side partials (the path space is
  * T³-bounded, not event-bounded — the count-distinct ships user ids
  * only for observed (path, user) pairs), then the bounded top-K. At
  * warehouse scale this is the X37 heavy-hitter shape over a derived
  * key. Nothing global but the K-row cut itself.
  *
  * Reference scope: no sequence ops in the reference; engine extension
  * (SURVEY §2.5, the X38/X40/X93 behavior family).
  */
object PathMining {

  val K = 20

  def topPathTrigrams(spark: SparkSession, dir: String): DataFrame =
    pathTrigramsOf(Tables.events(spark, dir))

  /** Core of X127 over any (user_id, ts, event_id, event_type) frame;
    * test seam. */
  private[graft] def pathTrigramsOf(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events
      .select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("e2", lead($"event_type", 1).over(w))
      .withColumn("e3", lead($"event_type", 2).over(w))
      .filter($"e2".isNotNull && $"e3".isNotNull)
      .select($"user_id",
        concat_ws(">", $"event_type", $"e2", $"e3").as("path"))
      .groupBy($"path")
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct($"user_id").as("n_users"))
      .orderBy($"n_users".desc, $"n_occurrences".desc, $"path")
      .limit(K)
  }

  val topPathTrigramsSql: String =
    s"""WITH p AS (
       |  SELECT user_id,
       |         event_type || '>' ||
       |         lead(event_type, 1) OVER w || '>' ||
       |         lead(event_type, 2) OVER w AS path,
       |         lead(event_type, 2) OVER w AS e3
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       |SELECT path, count(*) AS n_occurrences,
       |       count(DISTINCT user_id) AS n_users
       |FROM p WHERE e3 IS NOT NULL
       |GROUP BY path
       |ORDER BY n_users DESC, n_occurrences DESC, path
       |LIMIT $K""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x127_top_path_trigrams" -> topPathTrigrams _)

  val oracles: Map[String, String] = Map(
    "x127_top_path_trigrams" -> topPathTrigramsSql)
}
