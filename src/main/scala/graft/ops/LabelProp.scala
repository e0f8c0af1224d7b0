package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X96 — clamped synchronous label propagation over the collocation
  * graph: a SEED subset of the vocabulary carries trusted labels (each
  * seed term's dominant document language, majority with a total-order
  * tie-break); labels then spread for exactly [[Rounds]] synchronous
  * rounds — each unlabeled node takes the MAJORITY label among its
  * labeled neighbors (ties → smallest label), seeds stay clamped. The
  * weak-supervision workhorse: a small high-precision labeled set (in
  * production a curated allow/deny list, a classifier's confident
  * slice) is propagated over a similarity/co-occurrence structure to
  * label the long tail — the graph sibling of X16's per-document
  * n-gram lang-ID (X16 scores each doc in isolation; X96 labels
  * VOCABULARY by network consensus).
  *
  * Seed membership is a deterministic hash band — `md5Long40` of the
  * salted term ≡ 0 (mod [[SeedMod]]), df ≥ [[MinSeedDf]] — the
  * engine-portable stand-in for "an external curated list labels ~1/3
  * of the vocabulary" (the testdata's vocabulary is shared across all
  * five languages, so no purity predicate can split it; what matters
  * here is the propagation machinery, not the seed oracle, and the
  * hash band keeps the seed set deterministic, scale-stable, and
  * identically computable by the DuckDB oracle).
  *
  * Determinism without convergence claims: synchronous majority-vote
  * propagation can OSCILLATE (a 2-coloring-shaped region flips
  * forever), so unlike X95's monotone peel there is no fixpoint
  * guarantee to lean on — and none is needed: the engine runs exactly
  * [[Rounds]] synchronous rounds with a total-order tie-break
  * (max count, then smallest label string), and the DuckDB oracle
  * unrolls the SAME rounds with MATERIALIZED per-round CTEs (the
  * X84/X95 unrolled-oracle pattern) — bit-equal at any scale whether
  * or not the diffusion has settled. LabelPropSpec separately probes
  * how much of the front still moves at the margin.
  *
  * Scale shape: seeds are one distinct + keyed aggregate over the
  * token-doc pairs (vocabulary-bounded); per round the only data-moving
  * work is one join of the bidirectional edge list against the
  * vocabulary-bounded label table and one (node, label)-keyed count —
  * the majority pick is a keyed `min(struct(-count, label))` aggregate,
  * NOT a window; `localCheckpoint` pins per-round lineage flat (the
  * X18/X84/X95 loop discipline). Edges come from the shared memoized
  * [[CorpusIndex.collocationEdges]] (one tokenize + pair-count pass per
  * session, shared with X81/X84/X95).
  *
  * Reference scope: no graph ops in the reference; engine extension
  * (SURVEY §2.5 graph family).
  */
object LabelProp {

  val MinSeedDf = 3
  val Rounds = 4
  /** One term in [[SeedMod]] is seed-labeled (hash-banded). */
  val SeedMod = 3
  private val Salt = "x96|"

  def labelProp(spark: SparkSession, dir: String): DataFrame =
    labelPropOf(Tables.documents(spark, dir),
      CorpusIndex.collocationEdges(spark, dir))

  /** Core of X96 over any (doc_id, lang, text) frame and (u, v)
    * canonical edge frame; test seam. Returns every node labeled after
    * [[Rounds]] rounds with its label and origin (`seed` | `prop`).
    */
  private[graft] def labelPropOf(docs: DataFrame, edgesIn: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val nodes = edgesIn.select($"u".as("n"))
      .unionAll(edgesIn.select($"v".as("n"))).distinct()
    val termDocs = docs
      .select($"doc_id", $"lang",
        explode(split(trim(lower($"text")), "\\s+")).as("n"))
      .distinct()
    val perLang = termDocs.groupBy($"n", $"lang")
      .agg(count(lit(1)).as("c"))
    val seeds = perLang.groupBy($"n")
      .agg(sum($"c").as("df"),
        min(struct((-$"c").as("negc"), $"lang")).as("best"))
      .filter($"df" >= MinSeedDf &&
        graft.functions.Hashing.md5Long40(concat(lit(Salt), $"n"))
          % SeedMod === 0)
      .join(nodes, Seq("n"), "left_semi")
      .select($"n", $"best.lang".as("label"))
      .localCheckpoint()
    propagate(seeds, edgesIn, Rounds)
  }

  /** The propagation machinery alone over any (n, label) seed frame and
    * (u, v) edge frame; fixture seam (seeds injected directly).
    */
  private[graft] def propagate(seeds: DataFrame, edgesIn: DataFrame,
      rounds: Int): DataFrame = {
    val spark = seeds.sparkSession
    import spark.implicits._
    val nbr = edgesIn.select($"u".as("n"), $"v".as("m"))
      .unionAll(edgesIn.select($"v".as("n"), $"u".as("m")))
    var labels = seeds
    for (_ <- 1 to rounds) {
      val votes = nbr
        .join(labels.select($"n".as("m"), $"label"), Seq("m"))
        .groupBy($"n", $"label").agg(count(lit(1)).as("c"))
      val prop = votes
        .groupBy($"n")
        .agg(min(struct((-$"c").as("negc"), $"label")).as("best"))
        .select($"n", $"best.label".as("label"))
      labels = seeds.unionByName(
        prop.join(seeds.select($"n"), Seq("n"), "left_anti"))
        .localCheckpoint()
    }
    labels
      .join(seeds.select($"n", lit(true).as("is_seed")), Seq("n"), "left")
      .select($"n".as("w"), $"label",
        when($"is_seed", "seed").otherwise("prop").as("origin"))
      .orderBy($"w")
  }

  /** Per-round CTEs are MATERIALIZED (the X95 lesson: each round is
    * referenced by the next's vote join AND the clamp anti-join;
    * default inlining would exponentiate the corpus scans).
    */
  val labelPropSql: String = {
    val rounds = (1 to Rounds).map { r =>
      val prev = if (r == 1) "l0" else s"l${r - 1}"
      s"""v$r AS MATERIALIZED (
         |  SELECT nb.n, l.label, count(*) AS c
         |  FROM nb JOIN $prev l ON nb.m = l.n
         |  GROUP BY nb.n, l.label),
         |p$r AS (
         |  SELECT n, label FROM (
         |    SELECT n, label, row_number() OVER (
         |      PARTITION BY n ORDER BY c DESC, label ASC) AS rk
         |    FROM v$r)
         |  WHERE rk = 1),
         |l$r AS MATERIALIZED (
         |  SELECT n, label FROM seedsg
         |  UNION ALL
         |  SELECT p.n, p.label FROM p$r p
         |  WHERE NOT EXISTS (SELECT 1 FROM seedsg s WHERE s.n = p.n))""".stripMargin
    }.mkString(",\n")
    s"""WITH ${Triangles.edgeCtesSql},
       |nb AS MATERIALIZED (
       |  SELECT u AS n, v AS m FROM edges
       |  UNION ALL SELECT v, u FROM edges),
       |nodes AS MATERIALIZED (SELECT DISTINCT n FROM nb),
       |td AS (
       |  SELECT DISTINCT k.term AS n, d.lang, k.doc_id
       |  FROM tok k JOIN documents d ON k.doc_id = d.doc_id),
       |pl AS (
       |  SELECT n, lang, count(*) AS c FROM td GROUP BY 1, 2),
       |st AS (
       |  SELECT n, lang, c,
       |         sum(c) OVER (PARTITION BY n) AS df,
       |         row_number() OVER (
       |           PARTITION BY n ORDER BY c DESC, lang ASC) AS rk
       |  FROM pl),
       |seedsg AS MATERIALIZED (
       |  SELECT s.n, s.lang AS label
       |  FROM st s JOIN nodes nd ON s.n = nd.n
       |  WHERE s.rk = 1 AND s.df >= $MinSeedDf
       |    AND ${graft.functions.Hashing.sqlMd5Long40(s"'$Salt' || s.n")}
       |          % $SeedMod = 0),
       |l0 AS MATERIALIZED (SELECT n, label FROM seedsg),
       |$rounds
       |SELECT l.n AS w, l.label,
       |       CASE WHEN s.n IS NOT NULL THEN 'seed' ELSE 'prop' END AS origin
       |FROM l$Rounds l LEFT JOIN seedsg s ON l.n = s.n
       |ORDER BY w""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x96_label_prop" -> labelProp _)

  val oracles: Map[String, String] = Map(
    "x96_label_prop" -> labelPropSql)
}
