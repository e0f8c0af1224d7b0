package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X110 — BPE merge induction: learn the first [[Rounds]] byte-pair
  * merges from the corpus (Sennrich-style subword training) — the
  * TRAIN half of the tokenizer pair whose APPLY half is X59 (X50 plans
  * a word vocabulary, X59 applies one; X110 is where a subword
  * vocabulary comes FROM: each round finds the corpus's most frequent
  * adjacent symbol pair and fuses it into a new symbol). The output is
  * the merge table (round, lhs, rhs, pair_freq) a tokenizer ships.
  *
  * Semantics, pinned exactly:
  *  - training runs on the WORD-TYPE table weighted by corpus
  *    frequency (the standard formulation — and the scale story: the
  *    per-round state is vocabulary-bounded, never the token stream);
  *  - a round's pair counts weigh every adjacent POSITION ("aaa"
  *    contributes twice to (a,a)), the classic counting rule;
  *  - the winner is argmax under the TOTAL order (freq DESC, lhs ASC,
  *    rhs ASC) — deterministic across engines, no tie luck;
  *  - merging replaces LEFTMOST-first non-overlapping occurrences:
  *    within each run of consecutive matching positions, the 1st, 3rd,
  *    5th… apply — the parity rule, expressed as two stacked windows
  *    (run grouping via pos − row_number, then odd ranks within the
  *    run) IDENTICALLY in both engines — no UDF, no per-row recursion;
  *  - a merged symbol participates in the NEXT round's counts (so
  *    round 2 can fuse ("aa", "a")), never re-merges within its own.
  *
  * Determinism without a data-dependent loop count: [[Rounds]] is a
  * compile-time constant and the DuckDB oracle unrolls the same rounds
  * as MATERIALIZED CTEs (the X84/X95/X96 unrolled-oracle pattern —
  * each round references the previous several times, and default CTE
  * inlining would exponentiate the corpus scan). A round with no
  * multi-symbol word left emits no row and passes state through
  * unchanged — both engines degrade identically.
  *
  * Scale shape: ONE corpus-sized pass (the word-frequency aggregate,
  * map-side combined); every round after runs on the vocabulary-bounded
  * symbol table — per-word windows (bounded partitions), one best-pair
  * TakeOrderedAndProject broadcast as a 1-row join (never a driver
  * collect), localCheckpoint pinning per-round lineage flat (the X18/
  * X84 loop discipline). Nothing global but the final ORDER BY.
  *
  * Reference scope: no tokenizer training in the reference; engine
  * extension (SURVEY §2.5, the X15/X50/X59 tokenizer family).
  */
object Bpe {

  val Rounds = 4

  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesOf(Tables.documents(spark, dir))

  /** Core of X110 over any (doc_id, text) frame; test seam. Returns
    * the merge table (round, lhs, rhs, pair_freq), one row per round
    * that found a mergeable pair.
    */
  private[graft] def bpeMergesOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(split(trim(lower($"text")), "\\s+")).as("word"))
      .groupBy($"word").agg(count(lit(1)).as("freq"))
    // initial symbol table: one row per character position
    var toks = words
      .select($"word", $"freq",
        explode(sequence(lit(1), length($"word"))).as("pos"))
      .select($"word", $"freq", $"pos".cast("long").as("pos"),
        expr("substring(word, cast(pos as int), 1)").as("sym"))
      .localCheckpoint()

    var merges: Option[DataFrame] = None
    for (r <- 1 to Rounds) {
      // Round restructure (round-18 optimization): the adjacent-pair
      // stream is a lead() window over the word-partitioned symbol
      // table, not a (word, pos+1) self-join — the join re-shuffled
      // BOTH toks copies on (word, pos) every round; lead() rides the
      // word partitioning the checkpoint already carries. The winning
      // pair is checkpointed (1 row): it feeds both the merge table
      // and the match flags, and un-materialized it re-ran its whole
      // aggregation per consumer (once in the next round's checkpoint,
      // once again in the final union's execution).
      val w = Window.partitionBy($"word").orderBy($"pos")
      val paired = toks.withColumn("rhs", lead($"sym", 1).over(w))
      val pairs = paired.filter($"rhs".isNotNull)
        .select($"word", $"freq", $"pos", $"sym".as("lhs"), $"rhs")
      val best = pairs.groupBy($"lhs", $"rhs")
        .agg(sum($"freq").as("pair_freq"))
        .orderBy($"pair_freq".desc, $"lhs".asc, $"rhs".asc)
        .limit(1)
        .localCheckpoint()
      val roundRow = best.select(lit(r.toLong).as("round"),
        $"lhs", $"rhs", $"pair_freq")
      merges = Some(merges.map(_.unionAll(roundRow)).getOrElse(roundRow))
      // Merge application fused into windows over the SAME word
      // partitioning (no joins): attach the 1-row winner via a
      // broadcast left nested-loop join (left: an empty winner — no
      // mergeable pair — must pass state through unchanged, which a
      // cross join would empty out), flag matches, group consecutive
      // matched positions into runs (pos − running-match-count), rank
      // within the run (running count − count before the run), apply
      // odd ranks (leftmost-first non-overlap), drop the right symbol
      // of each applied merge via lag(), and re-number positions —
      // the former four-frame join chain (m/applied/dropped/toks)
      // expressed as one windowed pass.
      val flagged = paired.join(
          broadcast(best.select($"lhs".as("bl"), $"rhs".as("br"))),
          lit(true), "left")
        .withColumn("match",
          coalesce($"rhs".isNotNull && $"sym" === $"bl" && $"rhs" === $"br",
            lit(false)))
        .withColumn("cum",
          sum(when($"match", 1L).otherwise(0L)).over(w))
        .withColumn("grp", when($"match", $"pos" - $"cum"))
      val runW = Window.partitionBy($"word", $"grp").orderBy($"pos")
      val applied = flagged
        .withColumn("k", $"cum" - min($"cum").over(runW) + 1L)
        .withColumn("applied", $"match" && $"k" % 2 === 1)
      toks = applied
        .withColumn("dropped",
          coalesce(lag($"applied", 1).over(w), lit(false)))
        .filter(!$"dropped")
        .select($"word", $"freq", $"pos",
          when($"applied", concat($"sym", $"rhs")).otherwise($"sym")
            .as("sym"))
        .withColumn("pos", row_number().over(
          Window.partitionBy($"word").orderBy($"pos")).cast("long"))
        .localCheckpoint()
    }
    merges.get.orderBy($"round")
  }

  /** Unrolled-oracle SQL: [[Rounds]] MATERIALIZED rounds over the
    * word-type symbol table, same counting / argmax / parity rules.
    */
  val bpeMergesSql: String = {
    val rounds = (1 to Rounds).map { r =>
      val prev = s"t${r - 1}"
      s"""p$r AS MATERIALIZED (
         |  SELECT a.word, a.freq, a.pos, a.sym AS lhs, b.sym AS rhs
         |  FROM $prev a JOIN $prev b
         |    ON a.word = b.word AND b.pos = a.pos + 1),
         |b$r AS MATERIALIZED (
         |  SELECT lhs, rhs, sum(freq) AS pair_freq
         |  FROM p$r GROUP BY 1, 2
         |  ORDER BY pair_freq DESC, lhs ASC, rhs ASC LIMIT 1),
         |m$r AS MATERIALIZED (
         |  SELECT p.word, p.pos, p.lhs || p.rhs AS ms
         |  FROM p$r p JOIN b$r b ON p.lhs = b.lhs AND p.rhs = b.rhs),
         |a$r AS MATERIALIZED (
         |  SELECT word, pos, ms FROM (
         |    SELECT word, pos, ms,
         |           row_number() OVER (PARTITION BY word, grp
         |             ORDER BY pos) AS k
         |    FROM (SELECT word, pos, ms,
         |                 pos - row_number() OVER (PARTITION BY word
         |                   ORDER BY pos) AS grp
         |          FROM m$r))
         |  WHERE k % 2 = 1),
         |t$r AS MATERIALIZED (
         |  SELECT word, freq,
         |         row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
         |         sym
         |  FROM (
         |    SELECT t.word, t.freq, t.pos,
         |           CASE WHEN a.pos IS NOT NULL THEN a.ms ELSE t.sym END AS sym
         |    FROM t${r - 1} t
         |    LEFT JOIN a$r a ON t.word = a.word AND t.pos = a.pos
         |    WHERE NOT EXISTS (
         |      SELECT 1 FROM a$r d
         |      WHERE d.word = t.word AND d.pos = t.pos - 1)))""".stripMargin
    }.mkString(",\n")
    val out = (1 to Rounds).map(r =>
      s"SELECT $r AS round, lhs, rhs, pair_freq FROM b$r")
      .mkString("\n  UNION ALL ")
    s"""WITH w AS MATERIALIZED (
       |  SELECT word, count(*) AS freq FROM (
       |    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
       |    FROM documents)
       |  GROUP BY 1),
       |t0 AS MATERIALIZED (
       |  SELECT w.word, w.freq, CAST(u.i AS BIGINT) AS pos,
       |         substr(w.word, u.i, 1) AS sym
       |  FROM w, LATERAL unnest(generate_series(1, len(w.word))) AS u(i)),
       |$rounds
       |SELECT CAST(round AS BIGINT) AS round, lhs, rhs,
       |       CAST(pair_freq AS BIGINT) AS pair_freq
       |FROM (
       |  $out)
       |ORDER BY round""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x110_bpe_merges" -> bpeMerges _)

  val oracles: Map[String, String] = Map(
    "x110_bpe_merges" -> bpeMergesSql)
}
