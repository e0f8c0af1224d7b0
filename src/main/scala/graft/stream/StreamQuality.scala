package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

import graft.functions.{FdCells, KeyedCounts}

/** X168/X169 — streaming data-quality maintenance: the quality family's
  * two remaining batch-only members kept incrementally over unbounded
  * streams, closing it the way X161/X162 closed the sketch and
  * centroid families.
  *
  * X168 — streaming per-user behavioral entropy (X164): the state per
  * user is its (event_type → count) table — X88's keyed-metrics shape
  * — held as ONE bounded [[graft.functions.KeyedCounts]] buffer row
  * (|types| saturates; the corpus-cardinality axis is the KEY, which
  * is exactly what streaming aggregation shards). Counts are linear,
  * so streamed ≡ batch is BIT-equal, and the emitted row computes
  * X164's exact quantized-term entropy from the final counts — same
  * columns, same i64 term math, so the monitor and the nightly batch
  * audit speak the same number.
  *
  * X169 — streaming functional-dependency monitor (X165): the state
  * per declared dependency is its (lhs, rhs) CELL-count table — one
  * bounded [[graft.functions.FdCells]] buffer row per dependency. Only
  * the CATEGORICAL dependencies ([[StreamDeps]] — source→lang,
  * lang→source: the provenance checks a mixture build alarms on) are
  * streamed: their cell domain saturates (the `types` bound class).
  * The key-determined dependencies (doc_id→…) stay the batch X165's
  * job by declared design — their determinant is corpus-cardinality,
  * which no bounded stream state can hold.
  *
  * Reference scope: the reference validates nothing on its stream;
  * engine extension (SURVEY §2.5, the X149/X150/X164/X165 quality
  * family's streaming closure).
  */
object StreamQuality {

  /** The streamed (categorical) dependencies — see scaladoc. */
  val StreamDeps: Seq[(String, String)] = Seq(
    "source" -> "lang",
    "lang" -> "source")

  /** NULL-key sentinel: the batch X164/X165 ops GROUP nulls as a key,
    * but a null fed to the typed aggregators crashes their finish
    * (sortBy on a null string / substring on a null cell) — so the
    * monitors coalesce key columns to this sentinel BEFORE aggregating.
    * `\u0001` cannot appear in the categorical domains by the same
    * convention that bans `\u0000` from FD determinants, so the sentinel
    * group IS the null group and the streamed ≡ batch law survives
    * dirty corpora (neither monitor emits key names, only counts —
    * the sentinel never reaches the output).
    */
  val NullKey = "\u0001"

  /** X168: per-user live entropy over a (streaming or batch)
    * (user_id, event_type) frame — X164's output columns exactly. */
  def entropyMonitor(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val kc = udaf(new KeyedCounts, ExpressionEncoder[String]())
    events
      .groupBy($"user_id")
      .agg(kc(coalesce($"event_type", lit(NullKey))).as("tc"))
      .withColumn("n_events",
        expr("aggregate(tc, 0L, (acc, x) -> acc + x._2)"))
      .withColumn("n_types", size($"tc").cast("long"))
      // X164's quantized per-type terms summed exactly (integer adds —
      // buffer order is sorted, but exactness never depends on it)
      .withColumn("h_q", expr(
        "aggregate(tc, 0L, (acc, x) -> acc + CAST(floor(" +
          "-(CAST(x._2 AS DOUBLE) / CAST(n_events AS DOUBLE)) * " +
          "ln(CAST(x._2 AS DOUBLE) / CAST(n_events AS DOUBLE)) * 1e9) " +
          "AS BIGINT))"))
      .select($"user_id", $"n_events", $"n_types",
        when($"n_types" === 1L, lit(0.0))
          .otherwise($"h_q".cast("double") / 1e9).as("entropy_nats"))
  }

  /** X169: live FD-violation statistics over a (streaming or batch)
    * documents-shaped frame — X165's output columns exactly, restricted
    * to [[StreamDeps]]. */
  def fdMonitor(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val cells = udaf(new FdCells, ExpressionEncoder[String]())
    val stacked = StreamDeps.map { case (a, b) =>
      docs.select(lit(s"$a->$b").as("dependency"),
        concat(coalesce(col(a), lit(NullKey)), lit("\u0000"),
          coalesce(col(b), lit(NullKey))).as("cell"))
    }.reduce(_ unionByName _)
    stacked
      .groupBy($"dependency")
      .agg(cells($"cell").as("s"))
      .select($"dependency",
        $"s._1".as("n_groups"),
        $"s._2".as("n_violating_groups"),
        $"s._3".as("n_violating_rows"),
        ($"s._3".cast("double") / $"s._4".cast("double"))
          .as("violation_rate"),
        ($"s._2" === 0L).as("holds"))
  }
}
