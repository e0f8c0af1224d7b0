package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X44 — word co-occurrence with PMI: unordered token pairs within a
  * [[WindowW]]-position skip-gram window, with exact corpus counts and
  * the pointwise mutual information score — the association statistic
  * behind phrase detection / collocation mining over a training corpus.
  *
  * Counts are the ground truth and stay exact i64 end to end: c_xy
  * (pair), c_x/c_y (unigram), and the corpus totals. PMI itself is
  * `ln(P(x,y) / (P(x)·P(y)))` = `ln((c_xy·N²) / (P·c_x·c_y))` with
  * N = token total and P = pair total; the ratio is evaluated in the
  * same left-associated double expression in both engines (identical
  * IEEE operands), and only the final `ln` goes through libm —
  * absorbed by round(…,6), the sanctioned use (never round exact
  * values).
  *
  * Scale shape: pair GENERATION is row-local — a position-indexed
  * transform over the token array (each token pairs with the next
  * [[WindowW]] positions), never a positional self-join of the token
  * stream (that join ships every token occurrence twice and explodes
  * on long documents). The exchanges are the (w1,w2) count agg and the
  * unigram agg, both with map-side partials; the unigram table is
  * cached once and feeds both sides of the pair join plus the token
  * total, and the totals ride an in-plan one-row broadcast (the x37
  * idiom — no driver action).
  */
object Cooccur {

  val WindowW = 2
  val MinPair = 5

  def cooccurPmi(spark: SparkSession, dir: String): DataFrame =
    cooccurOf(Tables.documents(spark, dir), WindowW, MinPair)

  /** Core of X44 over any (doc_id, text) frame; test seam. */
  def cooccurOf(docs: DataFrame, windowW: Int, minPair: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select($"doc_id",
      split(trim(lower($"text")), "\\s+").as("w"))
    // unigram counts: feeds the w1 join, the w2 join, and the token
    // total — localCheckpoint so the tokenize+agg runs once without
    // leaving a session-lifetime InMemoryRelation (the Heaps pattern)
    val uni = words
      .select(explode($"w").as("term"))
      .groupBy($"term").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    // row-local pair generation: token i pairs with positions
    // i+1 … i+WindowW, canonicalized so w1 <= w2 — no positional
    // self-join. The fused native expression emits the pair strings
    // directly (one codegen'd pass; the nested-lambda reference form
    // is interpreted per pair — this query measured 1.43 s → 0.95 s
    // at sf0.1, medians of 5 in isolated warm sessions; x49's bigram
    // build 1.20 s → 0.71 s); the pair splits back into (w1, w2)
    // AFTER aggregation, on vocab²-bounded rows
    val pairs = words.select(
      explode(graft.functions.Hashing.skipGramPairs(
        $"w", windowW, canonical = true)).as("p"))
    // full pair counts (pre-threshold): reused for the pair total, so
    // materialize the compressed aggregate, not the pair stream
    val cxy = pairs.groupBy($"p")
      .agg(count(lit(1)).as("c_xy"))
      .select(split($"p", " ").getItem(0).as("w1"),
        split($"p", " ").getItem(1).as("w2"), $"c_xy")
      .localCheckpoint()
    val totals = uni.agg(sum($"c").as("n_tok"))
      .crossJoin(cxy.agg(sum($"c_xy").as("n_pairs")))
    val u1 = uni.select($"term".as("w1"), $"c".as("c_x"))
    val u2 = uni.select($"term".as("w2"), $"c".as("c_y"))
    cxy.filter($"c_xy" >= minPair)
      .join(u1, "w1").join(u2, "w2")
      .crossJoin(broadcast(totals))
      .select($"w1", $"w2", $"c_xy", $"c_x", $"c_y",
        round(log(($"c_xy".cast("double") * $"n_tok" * $"n_tok")
          / ($"n_pairs".cast("double") * $"c_x" * $"c_y")), 6).as("pmi_q"))
      .orderBy($"w1", $"w2")
  }

  val cooccurPmiSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |         string_split_regex(trim(lower(text)), '\\s+') AS w
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, generate_subscripts(w, 1) AS pos,
       |         unnest(w) AS term
       |  FROM t),
       |uni AS (SELECT term, count(*) AS c FROM tok GROUP BY 1),
       |pr AS (
       |  SELECT least(a.term, b.term) AS w1, greatest(a.term, b.term) AS w2
       |  FROM tok a JOIN tok b
       |    ON a.doc_id = b.doc_id
       |   AND b.pos > a.pos AND b.pos <= a.pos + $WindowW),
       |cxy AS (SELECT w1, w2, count(*) AS c_xy FROM pr GROUP BY 1, 2),
       |tot AS (SELECT (SELECT CAST(sum(c) AS BIGINT) FROM uni) AS n_tok,
       |               (SELECT CAST(sum(c_xy) AS BIGINT) FROM cxy) AS n_pairs)
       |SELECT c.w1, c.w2, c.c_xy, u1.c AS c_x, u2.c AS c_y,
       |       round(ln((CAST(c.c_xy AS DOUBLE) * t.n_tok * t.n_tok)
       |              / (CAST(t.n_pairs AS DOUBLE) * u1.c * u2.c)), 6) AS pmi_q
       |FROM cxy c
       |JOIN uni u1 ON c.w1 = u1.term
       |JOIN uni u2 ON c.w2 = u2.term, tot t
       |WHERE c.c_xy >= $MinPair
       |ORDER BY c.w1, c.w2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x44_cooccur_pmi" -> cooccurPmi _)

  val oracles: Map[String, String] = Map(
    "x44_cooccur_pmi" -> cooccurPmiSql)
}
