package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X70 — nearest-centroid assignment: every vector classified to its
  * closest label centroid (squared euclidean), with its distance and a
  * flag for whether it landed on its own label — the k-means E-step,
  * and the decision rule behind clustering-based curation
  * (distance-to-centroid filtering, domain re-labeling, IVF coarse
  * assignment). X71 completes the loop with one full Lloyd iteration
  * (E-step + mergeable M-step + movement report). Composes X36's
  * centroid computation with X3's quantized-metric discipline.
  *
  * Plan shape at 100 TB: centroids are ONE mergeable aggregate
  * (posexplode → partial-agg by (label, dim) — x36's shape, never
  * holding more than |labels|×dims partial rows per task) collapsed to
  * |labels| array rows and BROADCAST; assignment is then a map-only
  * pass over the corpus (|labels| fused distance expressions per
  * vector) finished by a partial-aggregable min — `min(struct(dist,
  * label))` merges associatively, so no per-vector window and no
  * second shuffle of the (corpus × labels) stream.
  *
  * Parity: centroid means are `CAST(sum_q AS DOUBLE)/n/1e6` floats
  * (identical rational → identical IEEE rounding both engines; the
  * proven x36 path); distances decompose as dotQ(v,v) − 2·dotQ(v,c) +
  * dotQ(c,c) — three exact i64 quantized dots combined left-to-right
  * in double (identical operands ⇒ identical result, the x69 cosQ
  * rule); the argmin key is (dist_q, label), total and tie-free.
  */
object Assign {

  /** |labels| rows of (c_label, c: array<float>) — the mergeable x36
    * aggregate collapsed to broadcastable centroid arrays. */
  private[graft] def centroidArrays(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select($"label", posexplode($"embedding").as(Seq("dim", "v")))
      .select($"label", $"dim",
        floor($"v".cast("double") * Centroids.Scale).cast("long").as("q"))
      .groupBy($"label", $"dim")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"))
      .withColumn("m",
        ($"s".cast("double") / $"n" / Centroids.Scale).cast("float"))
      .groupBy($"label")
      .agg(array_sort(collect_list(struct($"dim", $"m"))).as("dm"))
      .select($"label".as("c_label"),
        expr("transform(dm, x -> x.m)").as("c"))
  }

  /** (vec_id, label, embedding, c_label, dist_q) for every vector ×
    * broadcast centroid. */
  private def scoredAgainst(e: DataFrame, cent: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.crossJoin(broadcast(cent))
      .select($"vec_id", $"label", $"embedding", $"c_label",
        (dotQ($"embedding", $"embedding")
          - lit(2.0) * dotQ($"embedding", $"c")
          + dotQ($"c", $"c")).as("dist_q"))
  }

  def centroidAssign(spark: SparkSession, dir: String): DataFrame =
    centroidAssignOf(Tables.embeddings(spark, dir))

  /** X70 over any (vec_id, label, embedding) frame — ScaleBench seam. */
  private[graft] def centroidAssignOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    scoredAgainst(e, centroidArrays(e))
      .drop("embedding")
      // partial-aggregable argmin: struct min is lexicographic on
      // (dist_q, c_label) — total order, merges map-side
      .groupBy($"vec_id", $"label")
      .agg(min(struct($"dist_q", $"c_label")).as("best"))
      .select($"vec_id", $"label",
        $"best.c_label".as("nearest_label"),
        ($"label" === $"best.c_label").as("is_own"),
        $"best.dist_q".as("dist_q"))
      .orderBy($"vec_id")
  }

  /** X71 — one full Lloyd iteration: E-step assignment against the
    * label-seeded centroids, M-step recomputation of centroids from the
    * assignment, and a per-cluster movement report (members gained,
    * L1 shift of the quantized centroid) — the convergence telemetry a
    * k-means/semantic-dedup curation loop reads each round.
    *
    * The argmin CARRIES the embedding through `min(struct(dist_q,
    * c_label, embedding))` — (dist_q, c_label) is already a total key,
    * so the array never tie-breaks, and the M-step needs no second join
    * against the corpus. New centroids are the same mergeable
    * (c_label, dim) partial-agg as the seed pass. Movement compares
    * i64 centroid fingerprints `floor(mean_q)` — exact both engines;
    * clusters that lose every member report NULL shift (no centroid).
    */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame =
    kmeansStepOf(Tables.embeddings(spark, dir))

  /** X71 over any (vec_id, label, embedding) frame — ScaleBench seam. */
  private[graft] def kmeansStepOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._

    val best = scoredAgainst(e, centroidArrays(e))
      .groupBy($"vec_id")
      .agg(min(struct($"dist_q", $"c_label", $"embedding")).as("best"),
        min($"label").as("label"))
      .select($"vec_id", $"label",
        $"best.c_label".as("c_label"), $"best.embedding".as("embedding"))

    val asg = best.groupBy($"c_label")
      .agg(count(lit(1)).as("n_assigned"),
        sum(when($"label" =!= $"c_label", 1L).otherwise(0L)).as("n_gained"))
      .withColumnRenamed("c_label", "a_label")

    def qsums(df: DataFrame, key: String) = df
      .select(col(key), posexplode($"embedding").as(Seq("dim", "v")))
      .select(col(key), $"dim",
        floor($"v".cast("double") * Centroids.Scale).cast("long").as("q"))
      .groupBy(col(key), $"dim")
      .agg(count(lit(1)).as("n"), sum($"q").as("s"))

    val oldC = qsums(e, "label")
    val newC = qsums(best, "c_label")
      .withColumnsRenamed(Map("c_label" -> "s_label", "n" -> "n2", "s" -> "s2"))
    val shift = oldC
      .join(newC, oldC("label") === newC("s_label") && oldC("dim") === newC("dim"),
        "left")
      .groupBy(oldC("label").as("s_label"))
      .agg(sum(abs(floor($"s2".cast("double") / $"n2")
        - floor($"s".cast("double") / $"n"))).as("shift_l1q"))

    val nb = e.groupBy($"label").agg(count(lit(1)).as("n_before"))
    nb.join(asg, nb("label") === asg("a_label"), "left")
      .join(shift, nb("label") === shift("s_label"), "left")
      .select(nb("label").as("c_label"), $"n_before",
        coalesce($"n_assigned", lit(0L)).as("n_assigned"),
        coalesce($"n_gained", lit(0L)).as("n_gained"),
        $"shift_l1q")
      .orderBy($"c_label")
  }

  /** Shared oracle CTE chain: exploded quantized corpus → seed
    * centroids → broadcast-scored distances → per-vector rank. Used by
    * both the x70 and x71 oracles (no drift between them). */
  private[graft] val centCtes: String = {
    val dvv = sqlDotQ("v.embedding", "v.embedding")
    val dvc = sqlDotQ("v.embedding", "c.c")
    val dcc = sqlDotQ("c.c", "c.c")
    s"""ex AS (
       |  SELECT label, i - 1 AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * ${Centroids.Scale})
       |           AS BIGINT) AS q
       |  FROM embeddings,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i)),
       |cagg AS (
       |  SELECT label, dim, count(*) AS n, CAST(sum(q) AS BIGINT) AS s
       |  FROM ex GROUP BY 1, 2),
       |cent AS (
       |  SELECT label AS c_label,
       |         list(CAST(CAST(s AS DOUBLE) / n / ${Centroids.Scale} AS FLOAT)
       |              ORDER BY dim) AS c
       |  FROM cagg GROUP BY label),
       |scored AS (
       |  SELECT v.vec_id, v.label, v.embedding, c.c_label,
       |         $dvv - 2.0 * $dvc + $dcc AS dist_q
       |  FROM embeddings v CROSS JOIN cent c),
       |rk AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY dist_q ASC, c_label ASC) AS rk
       |  FROM scored)""".stripMargin
  }

  val centroidAssignSql: String =
    s"""WITH $centCtes
       |SELECT vec_id, label, c_label AS nearest_label,
       |       (label = c_label) AS is_own, dist_q
       |FROM rk WHERE rk = 1
       |ORDER BY vec_id""".stripMargin

  val kmeansStepSql: String =
    s"""WITH $centCtes,
       |best AS (
       |  SELECT vec_id, label, embedding, c_label FROM rk WHERE rk = 1),
       |asg AS (
       |  SELECT c_label, count(*) AS n_assigned,
       |         CAST(sum(CASE WHEN label <> c_label THEN 1 ELSE 0 END)
       |           AS BIGINT) AS n_gained
       |  FROM best GROUP BY 1),
       |ex2 AS (
       |  SELECT c_label, i - 1 AS dim,
       |         CAST(floor(CAST(embedding[i] AS DOUBLE) * ${Centroids.Scale})
       |           AS BIGINT) AS q
       |  FROM best,
       |       LATERAL unnest(generate_series(1, len(embedding))) AS u(i)),
       |cagg2 AS (
       |  SELECT c_label, dim, count(*) AS n2, CAST(sum(q) AS BIGINT) AS s2
       |  FROM ex2 GROUP BY 1, 2),
       |shift AS (
       |  SELECT o.label AS s_label,
       |         CAST(sum(abs(
       |           CAST(floor(CAST(c2.s2 AS DOUBLE) / c2.n2) AS BIGINT)
       |           - CAST(floor(CAST(o.s AS DOUBLE) / o.n) AS BIGINT)))
       |           AS BIGINT) AS shift_l1q
       |  FROM cagg o LEFT JOIN cagg2 c2
       |    ON o.label = c2.c_label AND o.dim = c2.dim
       |  GROUP BY 1),
       |nb AS (SELECT label, count(*) AS n_before FROM embeddings GROUP BY 1)
       |SELECT nb.label AS c_label, nb.n_before,
       |       coalesce(a.n_assigned, 0) AS n_assigned,
       |       coalesce(a.n_gained, 0) AS n_gained,
       |       s.shift_l1q
       |FROM nb LEFT JOIN asg a ON nb.label = a.c_label
       |        LEFT JOIN shift s ON nb.label = s.s_label
       |ORDER BY c_label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x70_centroid_assign" -> centroidAssign _,
    "x71_kmeans_step" -> kmeansStep _)

  val oracles: Map[String, String] = Map(
    "x70_centroid_assign" -> centroidAssignSql,
    "x71_kmeans_step" -> kmeansStepSql)
}
