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
  * assignment). Composes X36's centroid computation with X3's
  * quantized-metric discipline.
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

  def centroidAssign(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = Tables.embeddings(spark, dir)

    // |labels| centroid arrays via the x36 mergeable shape
    val cent = e
      .select($"label", posexplode($"embedding").as(Seq("dim", "v")))
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

    e.crossJoin(broadcast(cent))
      .select($"vec_id", $"label", $"c_label",
        (dotQ($"embedding", $"embedding")
          - lit(2.0) * dotQ($"embedding", $"c")
          + dotQ($"c", $"c")).as("dist_q"))
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

  val centroidAssignSql: String = {
    val dvv = sqlDotQ("v.embedding", "v.embedding")
    val dvc = sqlDotQ("v.embedding", "c.c")
    val dcc = sqlDotQ("c.c", "c.c")
    s"""WITH ex AS (
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
       |  SELECT v.vec_id, v.label, c.c_label,
       |         $dvv - 2.0 * $dvc + $dcc AS dist_q
       |  FROM embeddings v CROSS JOIN cent c),
       |r AS (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id
       |           ORDER BY dist_q ASC, c_label ASC) AS rk
       |  FROM scored)
       |SELECT vec_id, label, c_label AS nearest_label,
       |       (label = c_label) AS is_own, dist_q
       |FROM r WHERE rk = 1
       |ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x70_centroid_assign" -> centroidAssign _)

  val oracles: Map[String, String] = Map(
    "x70_centroid_assign" -> centroidAssignSql)
}
