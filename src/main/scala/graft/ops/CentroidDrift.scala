package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing.{cosQ, dotQ, sqlCosQ, sqlDotQ}

/** X160 — cross-batch centroid stability audit: per label, how far the
  * class centroid moves between two ingestion batches of the same
  * corpus (the deterministic vec_id-parity split), as quantized
  * squared-L2 distance and cosine — the embedding-space regression
  * test a training pipeline runs on every new encoder build or feed
  * batch (a label whose centroid jumps between batches means the feed
  * or the encoder changed under that class; X117/X141 watch LENGTH
  * distributions drift, X152 streams that, X160 watches the EMBEDDING
  * GEOMETRY). Completes the centroid family: X36 computes them, X70/71
  * assign and iterate on them, X145 dedups within them, X160 audits
  * their stability.
  *
  * Exactness: both batch centroids are X36's proven chain verbatim
  * (exact i64-quantized (label, dim) sums, mean = identical rational ⇒
  * identical IEEE double in both engines); the distance decomposes as
  * dotQ(a,a) − 2·dotQ(a,b) + dotQ(b,b) — three exact-i64 quantized
  * dots combined in fixed order (the X70 rule) — and the cosine is
  * cosQ of the same pieces (the X4 float license). A label present in
  * only one batch reports NULL drift columns by explicit guard in
  * both engines.
  *
  * Scale shape: ONE (label, dim, batch) map-side-combined aggregate
  * over the corpus (the batch flag is a row-local bit — no second
  * scan), collapsed to 2·|labels| centroid arrays and joined at
  * |labels| rows. Output is |labels| rows.
  *
  * Reference scope: no embedding analytics in the reference; engine
  * extension (SURVEY §2.5, the X36/X70/X145 centroid family meeting
  * the X117/X141/X152 drift family).
  */
object CentroidDrift {

  def centroidDrift(spark: SparkSession, dir: String): DataFrame =
    driftOf(Tables.embeddings(spark, dir))

  /** Core of X160 over any (vec_id, label, embedding) frame. */
  private[graft] def driftOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // X36's mergeable (label, dim) aggregate with a batch axis: one
    // corpus pass, exact i64 sums, means identical in both engines
    val cent = e
      .select($"label", pmod($"vec_id", lit(2L)).as("batch"),
        posexplode($"embedding").as(Seq("dim", "v")))
      .select($"label", $"batch", $"dim",
        floor($"v".cast("double") * Centroids.Scale).cast("long").as("q"))
      .groupBy($"label", $"batch", $"dim")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"))
      .withColumn("m",
        ($"s".cast("double") / $"n" / Centroids.Scale).cast("float"))
      .groupBy($"label", $"batch")
      .agg(max($"n").as("n_vecs"),
        array_sort(collect_list(struct($"dim", $"m"))).as("dm"))
      .select($"label", $"batch", $"n_vecs",
        expr("transform(dm, x -> x.m)").as("c"))
    val a = cent.filter($"batch" === 0L)
      .select($"label", $"n_vecs".as("n_a"), $"c".as("ca"))
    val b = cent.filter($"batch" === 1L)
      .select($"label", $"n_vecs".as("n_b"), $"c".as("cb"))
    a.join(b, Seq("label"), "full_outer")
      .select($"label",
        coalesce($"n_a", lit(0L)).as("n_a"),
        coalesce($"n_b", lit(0L)).as("n_b"),
        when($"ca".isNull || $"cb".isNull, lit(null)).otherwise(
          // dotQ quantizes per-term at 1e15 — divide back to real units
          (dotQ($"ca", $"ca") - lit(2.0) * dotQ($"ca", $"cb")
            + dotQ($"cb", $"cb")) / lit(1e15)).as("l2sq_drift"),
        when($"ca".isNull || $"cb".isNull, lit(null)).otherwise(
          cosQ(dotQ($"ca", $"cb"), dotQ($"ca", $"ca"),
            dotQ($"cb", $"cb"))).as("cos_batches"))
      .orderBy($"label")
  }

  val centroidDriftSql: String =
    s"""WITH e AS (
       |  SELECT label, vec_id % 2 AS batch, i - 1 AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE)
       |           * ${Centroids.Scale}) AS BIGINT) AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i)),
       |m AS (
       |  SELECT label, batch, dim, count(*) AS n, sum(q) AS s
       |  FROM e GROUP BY 1, 2, 3),
       |cent AS (
       |  SELECT label, batch, CAST(max(n) AS BIGINT) AS n_vecs,
       |         list(CAST(CAST(s AS DOUBLE) / n / ${Centroids.Scale}
       |                AS FLOAT) ORDER BY dim) AS c
       |  FROM m GROUP BY 1, 2),
       |ab AS (
       |  SELECT coalesce(a.label, b.label) AS label,
       |         coalesce(a.n_vecs, 0) AS n_a,
       |         coalesce(b.n_vecs, 0) AS n_b,
       |         a.c AS ca, b.c AS cb
       |  FROM (SELECT * FROM cent WHERE batch = 0) a
       |  FULL OUTER JOIN (SELECT * FROM cent WHERE batch = 1) b
       |    ON a.label = b.label)
       |SELECT label, n_a, n_b,
       |       CASE WHEN ca IS NULL OR cb IS NULL THEN NULL
       |            ELSE (${sqlDotQ("ca", "ca")}
       |                    - 2.0 * ${sqlDotQ("ca", "cb")}
       |                    + ${sqlDotQ("cb", "cb")}) / 1e15 END
       |         AS l2sq_drift,
       |       CASE WHEN ca IS NULL OR cb IS NULL THEN NULL
       |            ELSE ${sqlCosQ(sqlDotQ("ca", "cb"),
                sqlDotQ("ca", "ca"), sqlDotQ("cb", "cb"))} END
       |         AS cos_batches
       |FROM ab
       |ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x160_centroid_drift" -> centroidDrift _)

  val oracles: Map[String, String] = Map(
    "x160_centroid_drift" -> centroidDriftSql)
}
