package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X118 — edit-distance ≤ 2 token join via deletion neighborhoods (the
  * SymSpell/FastSS family): all pairs of frequent corpus tokens within
  * TWO edits (insert/delete/substitute) — the spelling-variant /
  * tokenizer-fragmentation screen behind vocabulary planning (X50
  * counts the vocabulary, X110 learns merges; X118 finds the near-
  * duplicate entries that inflate it: "colour"/"color", typos, OCR
  * slips). The string analogue of the X2/X62 candidate-generation
  * discipline: never all-pairs — generate, bucket-join, verify.
  *
  * Losslessness of the candidate set (FastSS, Bocek et al. 2007): if
  * lev(a,b) ≤ k then a and b share a member of their ≤k-deletion
  * neighborhoods N_k(w) — align an optimal edit script and delete from
  * each word the characters it contributes to substitutions/inserts/
  * deletes: what remains is a common string reached by ≤k deletions
  * per side. So the hash-join on shared variants finds a SUPERSET
  * (shared variants also bridge farther pairs, e.g. "abcd"/"cdab"
  * share "ab" yet sit at distance 4), and the verify stage keeps
  * exactly lev ≤ 2 — both engines evaluate levenshtein on the same
  * ASCII-only tokens (the `^[a-z0-9]+$` screen keeps code-point-
  * counting differences off the table).
  *
  * Scale shape: the vocabulary is a corpus-bounded count aggregate with
  * map-side partials; the top-V cut (V = 500, deterministic (count
  * desc, token) tie-break) is a TakeOrderedAndProject, never a global
  * sort; variants are ≤ V·(1 + L + L²/2) rows (L = max token length),
  * deduped per word, joined hash-on-variant; the O(L²) verify filter
  * runs only on candidates. At warehouse scale V grows to the real
  * vocabulary (linear in V), while the oracle's length-banded
  * all-pairs form is quadratic in V — that gap is the point.
  *
  * Reference scope: no string-similarity ops in the reference; engine
  * extension (SURVEY §2.5, the X2/X41/X62 blocking family).
  */
object EditDistance {

  /** Vocabulary cap (see scale note above). */
  val V = 500

  def edit2TokenJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val vocab = Tables.documents(spark, dir)
      .select(explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word".rlike("^[a-z0-9]+$") && length($"word") >= 3 &&
        length($"word") <= 20)
      .groupBy($"word").agg(count(lit(1)).as("cnt"))
      .orderBy($"cnt".desc, $"word")
      .limit(V)
    edit2JoinOf(vocab)
  }

  /** Delete the 1-indexed char `d` (d = 0 keeps the word). */
  private def deleteAt(w: Column, d: Column): Column =
    when(d === 0, w).otherwise(concat(
      w.substr(lit(1), d - lit(1)),
      w.substr(d + lit(1), length(w) - d)))

  /** Core of X118 over any (word, cnt) vocabulary; test seam. */
  private[graft] def edit2JoinOf(vocab: DataFrame): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val variants = vocab
      .select($"word", $"cnt",
        explode(sequence(lit(0), length($"word"))).as("d1"))
      .select($"word", $"cnt", deleteAt($"word", $"d1").as("v1"))
      .select($"word", $"cnt", $"v1",
        explode(sequence(lit(0), length($"v1"))).as("d2"))
      .select($"word", $"cnt", deleteAt($"v1", $"d2").as("variant"))
      .distinct()
    variants.as("a")
      .join(variants.as("b"), col("a.variant") === col("b.variant") &&
        col("a.word") < col("b.word"))
      .select(col("a.word").as("word_a"), col("b.word").as("word_b"),
        col("a.cnt").as("cnt_a"), col("b.cnt").as("cnt_b"))
      .distinct()
      .withColumn("lev", levenshtein($"word_a", $"word_b").cast("long"))
      .filter($"lev" <= 2)
      .orderBy($"word_a", $"word_b")
  }

  val edit2TokenJoinSql: String =
    s"""WITH vocab AS (
       |  SELECT word, cnt FROM (
       |    SELECT word, count(*) AS cnt,
       |           row_number() OVER (ORDER BY count(*) DESC, word) AS rn
       |    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+'))
       |            AS word FROM documents)
       |    WHERE regexp_matches(word, '^[a-z0-9]+$$')
       |      AND length(word) BETWEEN 3 AND 20
       |    GROUP BY word)
       |  WHERE rn <= $V)
       |SELECT a.word AS word_a, b.word AS word_b,
       |       CAST(a.cnt AS BIGINT) AS cnt_a,
       |       CAST(b.cnt AS BIGINT) AS cnt_b,
       |       CAST(levenshtein(a.word, b.word) AS BIGINT) AS lev
       |FROM vocab a JOIN vocab b
       |  ON a.word < b.word
       | AND abs(length(a.word) - length(b.word)) <= 2
       | AND levenshtein(a.word, b.word) <= 2
       |ORDER BY word_a, word_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x118_edit2_token_join" -> edit2TokenJoin _)

  val oracles: Map[String, String] = Map(
    "x118_edit2_token_join" -> edit2TokenJoinSql)
}
