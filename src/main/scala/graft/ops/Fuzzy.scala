package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B41 — fuzzy (edit-distance) string matching with attribute blocking:
  * link pairs of DISTINCT part names within levenshtein distance ≤ 3,
  * candidates drawn only from names sharing a token.
  *
  * All-pairs levenshtein is quadratic in the vocabulary — the standard
  * entity-resolution answer is BLOCKING: compare only within buckets
  * that share a cheap exact key. Here the two blocks are the name's
  * first token (adjective) and last token (noun); the two candidate
  * sets are DISJOINT by construction (the noun block takes noun-equal
  * pairs, the adjective block requires nouns to differ), so the union
  * needs no distinct pass. The recall boundary is explicit and
  * documented — pairs sharing neither token are never compared (their
  * distance here is ≥ the full token length anyway) — which is the
  * honest contract of blocking ER systems, not an approximation bug;
  * the DuckDB oracle applies the identical blocking predicate, so the
  * hash gate pins the whole pipeline including the boundary.
  *
  * Scale shape: the name vocabulary aggregates out of the part table
  * with map-side partials (name cardinality grows far slower than rows);
  * each block is a hash equi-join on its token key, per-block work
  * quadratic only in BLOCK size. At open scale a block-size cap (drop or
  * split blocks past ~10⁴ members, like x43's hot-term cap) bounds the
  * worst block; the 64-name test vocabulary doesn't need it. Levenshtein
  * is evaluated ONLY on candidates that survive the block join, inside
  * codegen (both engines use the classic DP, so the integer distances
  * agree bit-for-bit).
  */
object Fuzzy {

  val MaxDist = 3

  def fuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val names = Tables.part(spark, dir)
      .groupBy($"p_name".as("name"))
      .agg(count(lit(1)).as("n_parts"))
      .withColumn("adj", element_at(split($"name", " "), 1))
      .withColumn("noun", element_at(split($"name", " "), -1))
      .localCheckpoint() // both sides of both block joins

    val a = names.select($"name".as("name_a"), $"n_parts".as("parts_a"),
      $"adj".as("adj_a"), $"noun".as("noun_a"))
    val b = names.select($"name".as("name_b"), $"n_parts".as("parts_b"),
      $"adj".as("adj_b"), $"noun".as("noun_b"))

    val nounBlock = a.join(b, $"noun_a" === $"noun_b" && $"name_a" < $"name_b")
    val adjBlock = a.join(b,
      $"adj_a" === $"adj_b" && $"noun_a" =!= $"noun_b" && $"name_a" < $"name_b")

    nounBlock.unionByName(adjBlock)
      .withColumn("dist", levenshtein($"name_a", $"name_b"))
      .filter($"dist" <= MaxDist)
      .select($"name_a", $"name_b", $"dist".cast("long").as("dist"),
        $"parts_a", $"parts_b")
      .orderBy($"name_a", $"name_b")
  }

  val fuzzyJoinSql: String =
    s"""WITH names AS (
       |  SELECT p_name AS name, count(*) AS n_parts,
       |         string_split(p_name, ' ')[1] AS adj,
       |         string_split(p_name, ' ')[-1] AS noun
       |  FROM part GROUP BY p_name),
       |cand AS (
       |  SELECT a.name AS name_a, b.name AS name_b,
       |         a.n_parts AS parts_a, b.n_parts AS parts_b
       |  FROM names a JOIN names b
       |    ON a.noun = b.noun AND a.name < b.name
       |  UNION ALL
       |  SELECT a.name, b.name, a.n_parts, b.n_parts
       |  FROM names a JOIN names b
       |    ON a.adj = b.adj AND a.noun <> b.noun AND a.name < b.name)
       |SELECT name_a, name_b,
       |       CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist,
       |       parts_a, parts_b
       |FROM cand
       |WHERE levenshtein(name_a, name_b) <= $MaxDist
       |ORDER BY name_a, name_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "b41_fuzzy_join" -> fuzzyJoin _)

  val oracles: Map[String, String] = Map(
    "b41_fuzzy_join" -> fuzzyJoinSql)
}
