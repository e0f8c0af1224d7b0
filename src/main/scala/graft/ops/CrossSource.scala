package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X60 — cross-source duplication matrix: verified near-dup pairs (the
  * X2 LSH + exact-Jaccard output) attributed to SOURCE pairs — the
  * provenance view of duplication that tells a corpus owner which
  * slices copy from which (mirror sites, syndicated feeds, re-crawls)
  * and feeds both mixture reweighting (x46) and per-source dedup
  * priorities (x22).
  *
  * The source pair is orientation-normalized with least/greatest (the
  * pair (A,B) and (B,A) are the same relationship; the diagonal is
  * within-source duplication). Overlap strength pools EXACTLY:
  * `pooled_jaccard = Σ n_common / Σ (n_sh_a + n_sh_b − n_common)` is a
  * single division of exact i64 sums — never a float mean of per-pair
  * ratios (order-dependent and weight-blind).
  *
  * Scale shape: everything downstream of the (already bucketed) X2
  * pair producer moves pair cardinality; the two source lookups are
  * doc_id-keyed joins against the (doc_id, source) projection, and the
  * matrix aggregate leaves ≤ |sources|² rows from the map side.
  */
object CrossSource {

  def crossSourceDups(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // shared memoized verify output — the pair producer costs nothing
    // here beyond the one candidate+verify pass x02/x65/x75 also read
    // (and no sort: the matrix aggregate doesn't need x02's ordering)
    val pairs = CorpusIndex.minhashScores(spark, dir)
      .filter($"jaccard" >= 0.5)
    val src = Tables.documents(spark, dir).select($"doc_id", $"source")

    pairs
      .join(src.as("sa"), $"doc_a" === col("sa.doc_id"))
      .join(src.as("sb"), $"doc_b" === col("sb.doc_id"))
      .select(
        least(col("sa.source"), col("sb.source")).as("source_a"),
        greatest(col("sa.source"), col("sb.source")).as("source_b"),
        $"n_common", ($"n_sh_a" + $"n_sh_b" - $"n_common").as("n_union"))
      .groupBy($"source_a", $"source_b")
      .agg(
        count(lit(1)).as("n_pairs"),
        sum($"n_common").as("common_shingles"),
        sum($"n_union").as("union_shingles"))
      .withColumn("pooled_jaccard",
        $"common_shingles".cast("double") / $"union_shingles".cast("double"))
      .orderBy($"source_a", $"source_b")
  }

  val crossSourceDupsSql: String =
    s"""WITH pairs AS (
       |${Dedup.minhashLshSql}
       |),
       |ds AS (SELECT doc_id, source FROM documents)
       |SELECT least(a.source, b.source) AS source_a,
       |       greatest(a.source, b.source) AS source_b,
       |       count(*) AS n_pairs,
       |       CAST(sum(n_common) AS BIGINT) AS common_shingles,
       |       CAST(sum(n_sh_a + n_sh_b - n_common) AS BIGINT)
       |         AS union_shingles,
       |       CAST(sum(n_common) AS DOUBLE)
       |         / CAST(sum(n_sh_a + n_sh_b - n_common) AS DOUBLE)
       |         AS pooled_jaccard
       |FROM pairs
       |JOIN ds a ON pairs.doc_a = a.doc_id
       |JOIN ds b ON pairs.doc_b = b.doc_id
       |GROUP BY 1, 2
       |ORDER BY source_a, source_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x60_cross_source_dups" -> crossSourceDups _)

  val oracles: Map[String, String] = Map(
    "x60_cross_source_dups" -> crossSourceDupsSql)
}
