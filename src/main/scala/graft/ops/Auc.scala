package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X106 — grouped exact AUC (Mann–Whitney U as integer fractions): for
  * each language, how well document LENGTH ranks near-dup membership —
  * the classifier-audit primitive ("does this score separate this
  * label?") run AS A QUERY, the way a data-quality team evaluates
  * heuristic filters before deploying them (X85 sweeps one score's
  * confusion counts across thresholds; X106 is the threshold-free
  * summary of the whole ranking, with ties handled exactly). The
  * concrete binding audits a real curation question — whether
  * boilerplate-duplicated docs are systematically shorter/longer —
  * with label = "participates in an X17-verified near-dup pair" read
  * from the memoized [[CorpusIndex.ngramPairs]] artifact.
  *
  * Exactness — never a float rank: with tied scores taking their
  * AVERAGE rank, twice a tie-group's average rank is the integer
  * `2·cum + c + 1` (the group occupies ranks cum+1 … cum+c), so
  * `2·R_pos = Σ p·(2·cum + c + 1)` and the tie-adjusted
  * `2U = 2·R_pos − n_pos·(n_pos+1)` stay in i64 end to end. The op
  * emits `auc_num = 2U`, `auc_den = 2·n_pos·n_neg` and ONE IEEE
  * division of the two (the b50/X99 discipline; a one-class group
  * yields NULL, not a 0/0 artifact).
  *
  * Scale shape: the label attach is one doc-keyed left join against
  * the (small) dup-membership set; ranks need no per-row window — rows
  * collapse to (group, score) tie-groups FIRST (map-side combined),
  * and the running rank offset is a window over tie-groups, bounded by
  * the distinct-score count per group, not the row count. One final
  * group-keyed aggregate. Nothing global but the final ORDER BY.
  *
  * Reference scope: no eval ops in the reference; engine extension
  * (SURVEY §2.5, the X85/X100/X102 measurement family).
  */
object Auc {

  def lengthDupAuc(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dup = CorpusIndex.ngramPairs(spark, dir)
      .select(explode(array($"doc_a", $"doc_b")).as("doc_id"))
      .distinct()
    aucOf(Tables.documents(spark, dir)
      .select($"doc_id", $"lang".as("grp"), $"n_chars".as("score")), dup)
  }

  /** Core of X106 over any (doc_id, grp, score:i64) frame and a
    * positive-membership (doc_id) frame; test seam.
    */
  private[graft] def aucOf(scored: DataFrame, posIds: DataFrame): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val lab = scored.join(
        posIds.select($"doc_id").distinct().withColumn("p1", lit(1L)),
        Seq("doc_id"), "left")
      .select($"grp", $"score", coalesce($"p1", lit(0L)).as("pos"))
    val ties = lab.groupBy($"grp", $"score")
      .agg(count(lit(1)).as("c"), sum($"pos").as("p"))
    val w = Window.partitionBy($"grp").orderBy($"score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = ties.withColumn("cum", coalesce(sum($"c").over(w), lit(0L)))
    ranked.groupBy($"grp")
      .agg(sum($"p").as("n_pos"), (sum($"c") - sum($"p")).as("n_neg"),
        sum($"p" * (lit(2L) * $"cum" + $"c" + lit(1L))).as("two_r_pos"))
      .select($"grp", $"n_pos", $"n_neg",
        ($"two_r_pos" - $"n_pos" * ($"n_pos" + lit(1L))).as("auc_num"),
        (lit(2L) * $"n_pos" * $"n_neg").as("auc_den"),
        when($"n_pos" * $"n_neg" === 0, lit(null).cast("double"))
          .otherwise(
            ($"two_r_pos" - $"n_pos" * ($"n_pos" + lit(1L))).cast("double")
              / (lit(2L) * $"n_pos" * $"n_neg").cast("double")).as("auc_q"))
      .orderBy($"grp")
  }

  val lengthDupAucSql: String =
    s"""WITH ${Dedup.ngramPairCtesFrom("documents")},
       |dup AS (
       |  SELECT DISTINCT doc_id FROM (
       |    SELECT doc_a AS doc_id FROM scored WHERE jaccard >= 0.5
       |    UNION ALL
       |    SELECT doc_b FROM scored WHERE jaccard >= 0.5)),
       |lab AS (
       |  SELECT d.lang AS grp, d.n_chars AS score,
       |         CASE WHEN dup.doc_id IS NULL THEN 0 ELSE 1 END AS pos
       |  FROM documents d LEFT JOIN dup ON d.doc_id = dup.doc_id),
       |ties AS (
       |  SELECT grp, score, count(*) AS c, sum(pos) AS p
       |  FROM lab GROUP BY 1, 2),
       |ranked AS (
       |  SELECT grp, score, c, p,
       |         coalesce(sum(c) OVER (PARTITION BY grp ORDER BY score
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
       |  FROM ties),
       |agg AS (
       |  SELECT grp, sum(p) AS n_pos, sum(c) - sum(p) AS n_neg,
       |         sum(p * (2 * cum + c + 1)) AS two_r_pos
       |  FROM ranked GROUP BY grp)
       |SELECT grp, CAST(n_pos AS BIGINT) AS n_pos,
       |       CAST(n_neg AS BIGINT) AS n_neg,
       |       CAST(two_r_pos - n_pos * (n_pos + 1) AS BIGINT) AS auc_num,
       |       CAST(2 * n_pos * n_neg AS BIGINT) AS auc_den,
       |       CASE WHEN n_pos * n_neg = 0 THEN NULL
       |            ELSE CAST(two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
       |                   / CAST(2 * n_pos * n_neg AS DOUBLE) END AS auc_q
       |FROM agg
       |ORDER BY grp""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x106_grouped_auc" -> lengthDupAuc _)

  val oracles: Map[String, String] = Map(
    "x106_grouped_auc" -> lengthDupAucSql)
}
