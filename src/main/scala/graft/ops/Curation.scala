package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X22 — the composed corpus-curation pass: the decision pipeline a
  * training-data build runs over raw documents, produced as a per-document
  * verdict log. Stages, in the order a 100 TB pass wants them (each stage
  * SHRINKS the corpus before the next, more expensive one):
  *
  *  1. score: row-local quality + language heuristics (Text.qualityOf —
  *     no shuffle, whole-stage codegen);
  *  2. filter: drop `quality_score < 0.5` → verdict `low_quality`;
  *  3. exact dedup: content-hash groups keep their min doc_id (one
  *     shuffle on the 32-byte hash; losers → `exact_dup`) — cheap exact
  *     matching BEFORE fuzzy matching, so identical boilerplate never
  *     reaches the quadratic-ish near-dup stage;
  *  4. near-dup: shingle ONLY the surviving unique docs
  *     (Dedup.shinglesOf on the filtered frame, not the corpus), generate
  *     exact-Jaccard pairs through the rare-shingle inverted index
  *     (Dedup.ngramJaccardOf), resolve clusters with the distributed CC
  *     loop (Dedup.connectedComponents);
  *  5. decide: per cluster keep the highest-quality doc (ties → min
  *     doc_id) → `kept`; the rest → `near_dup`.
  *
  * Output: every input document with (lang_guess, quality_score,
  * cluster_id, verdict) — cluster_id only for docs that reached the
  * clustering stage. The DuckDB oracle recomputes the whole pass
  * independently, deriving components via a recursive-CTE transitive
  * closure (the engine's iterative min-label loop never appears in the
  * oracle).
  *
  * Reference scope: the reference repo stops at envelope analytics; this
  * composition is part of the mandated LLM-pipeline extension set (SURVEY
  * §2.5), built entirely from the already-verified X10/X1/X17/X18 stages.
  */
object Curation {

  /** Quality threshold: ~10th percentile of the corpus score distribution
    * at every shipped SF, so the filter stage meaningfully drops docs
    * without starving the dedup stages.
    */
  val MinQuality = 0.5

  def curationPipeline(spark: SparkSession, dir: String): DataFrame =
    // ride the shared memoized verdict frame (which itself rides the
    // corpus shingle index — tokenize-once): x22 is the presentation
    // sort over the artifact the composed X91 build also consumes
    CorpusIndex.curationVerdicts(spark, dir).orderBy(col("doc_id"))

  /** Core of X22 over any (doc_id, text) frame; `minQuality` is the gate
    * threshold (the registered query uses [[MinQuality]], which the
    * oracle mirrors). `corpusShingles`, when supplied, must be the
    * (doc_id, sh) shingle set of the FULL input frame — stage 4 then
    * filters it to survivors instead of re-shingling.
    */
  def curationOf(docs: DataFrame, minQuality: Double = MinQuality,
      corpusShingles: Option[DataFrame] = None): DataFrame =
    curationVerdictsOf(docs, minQuality, corpusShingles)
      .orderBy(col("doc_id"))

  /** [[curationOf]] without the final presentation sort — the form a
    * downstream composition (X91) consumes, so the verdict frame joins
    * onward without a pointless mid-pipeline range exchange.
    */
  private[graft] def curationVerdictsOf(docs: DataFrame,
      minQuality: Double = MinQuality,
      corpusShingles: Option[DataFrame] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // scored feeds the verdict join AND the surviving-doc stages —
    // materialize the one row-local scan instead of re-scoring per
    // consumer (persisted intermediate at cluster scale). localCheckpoint,
    // not cache(): no session-lifetime InMemoryRelation from a registered
    // query (the Heaps pattern)
    val scored = Text.qualityOf(docs)
      .select($"doc_id", $"text", $"lang_guess", $"quality_score")
      .localCheckpoint()
    // stage 2+3: quality gate, then exact content-hash dedup. The
    // min-over-group window runs on a SLIM (doc_id, hash, quality)
    // projection — text never rides the text_hash shuffle (the window is
    // consumed twice, by `uniq` and by the verdict join, so keeping it
    // narrow matters twice over). Hash groups are tiny (dup-cluster
    // size), so the window never funnels a hot key.
    val withRep = scored
      .filter($"quality_score" >= minQuality)
      .select($"doc_id",
        sha2(lower(trim($"text")), 256).as("text_hash"), $"quality_score")
      .withColumn("rep",
        min($"doc_id").over(Window.partitionBy($"text_hash")))
      .select($"doc_id", $"quality_score", $"rep")
    // re-attach text to the surviving unique docs by doc_id — the ONE
    // shuffle text takes, and the same key the shingle stage partitions
    // by next
    val uniq = withRep.filter($"doc_id" === $"rep")
      .select($"doc_id", $"quality_score")
    // stage 4: near-dup pairs among the unique survivors ONLY — the
    // shingle/index cost is paid on the shrunk corpus, not the raw one
    // (or, when the corpus index is supplied, on a semi-join against it:
    // df is recomputed over the filtered frame either way, so the pair
    // semantics — and the oracle — are identical)
    val survivorShingles = corpusShingles match {
      case Some(sh) =>
        sh.join(uniq.select($"doc_id"), Seq("doc_id"), "left_semi")
      case None =>
        Dedup.shinglesOf(uniq.join(scored.select($"doc_id", $"text"), "doc_id"))
    }
    val pairs = Dedup.ngramJaccardOf(survivorShingles)
      .select($"doc_a", $"doc_b")
    val labels = Dedup.connectedComponents(pairs)
    val clustered = uniq
      .join(labels, $"doc_id" === $"doc", "left")
      .select($"doc_id",
        coalesce($"label", $"doc_id").as("cluster_id"),
        $"quality_score")
    // stage 5: canonical survivor per cluster = best quality, then min
    // doc_id (quality_score doubles are bit-identical in both engines, so
    // the rank is too)
    val ranked = clustered.withColumn("rn",
      row_number().over(Window.partitionBy($"cluster_id")
        .orderBy($"quality_score".desc, $"doc_id".asc)))
    scored
      .join(withRep.select($"doc_id", $"rep"), Seq("doc_id"), "left")
      .join(ranked.select($"doc_id", $"cluster_id", $"rn"), Seq("doc_id"), "left")
      .select($"doc_id", $"lang_guess", $"quality_score", $"cluster_id",
        when($"rep".isNull, "low_quality")
          .when($"doc_id" =!= $"rep", "exact_dup")
          .when($"rn" === 1, "kept")
          .otherwise("near_dup").as("verdict"))
  }

  /** The full curation-verdict CTE chain (t … ranked → `verdicts`),
    * shared verbatim by the x22 oracle and the X91 composed-manifest
    * oracle. Must be hosted under a `WITH RECURSIVE` prelude (the
    * transitive-closure `reach` CTE).
    */
  private[graft] val verdictCtes: String = {
    // the near-dup CTE chain over the curation survivors, not the corpus
    val pairCtes = Dedup.ngramPairCtesFromWith("uniq", mat = false)
    s"""t AS MATERIALIZED (
       |  SELECT doc_id, text,
       |         string_split_regex(trim(lower(text)), '\\s+') AS words
       |  FROM documents),
       |m AS MATERIALIZED (
       |  SELECT doc_id, text,
       |         CAST(len(words) AS BIGINT) AS n_tokens,
       |         CAST(len(list_filter(words, w -> w = 'the' OR w = 'a')) AS BIGINT) AS n_stop,
       |         CAST(length(regexp_replace(lower(text), '\\s+', '', 'g')) AS BIGINT) AS swc
       |  FROM t),
       |qdocs AS MATERIALIZED (
       |  SELECT doc_id, text,
       |         CASE WHEN CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.12
       |              THEN 'en_like' ELSE 'other' END AS lang_guess,
       |         least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.5
       |           + (1.0 - CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) * 0.3
       |           + least(1.0, (CAST(swc AS DOUBLE) / CAST(n_tokens AS DOUBLE)) / 8.0) * 0.2
       |           AS quality_score
       |  FROM m),
       |pass AS MATERIALIZED (
       |  SELECT doc_id, text, quality_score,
       |         min(doc_id) OVER (PARTITION BY sha256(lower(trim(text)))) AS rep
       |  FROM qdocs WHERE quality_score >= 0.5),
       |uniq AS MATERIALIZED (SELECT doc_id, text, quality_score FROM pass WHERE doc_id = rep),
       |$pairCtes,
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM scored WHERE jaccard >= 0.5),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
       |comp AS (
       |  SELECT a AS doc, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a),
       |clustered AS (
       |  SELECT u.doc_id,
       |         coalesce(c.cluster_id, u.doc_id) AS cluster_id,
       |         u.quality_score
       |  FROM uniq u LEFT JOIN comp c ON u.doc_id = c.doc),
       |ranked AS (
       |  SELECT doc_id, cluster_id,
       |         row_number() OVER (PARTITION BY cluster_id
       |                            ORDER BY quality_score DESC, doc_id ASC) AS rn
       |  FROM clustered),
       |verdicts AS (
       |  SELECT q.doc_id, q.lang_guess, q.quality_score,
       |         r.cluster_id,
       |         CASE WHEN p.doc_id IS NULL THEN 'low_quality'
       |              WHEN p.doc_id <> p.rep THEN 'exact_dup'
       |              WHEN r.rn = 1 THEN 'kept'
       |              ELSE 'near_dup' END AS verdict
       |  FROM qdocs q
       |  LEFT JOIN pass p ON q.doc_id = p.doc_id
       |  LEFT JOIN ranked r ON q.doc_id = r.doc_id)""".stripMargin
  }

  val curationPipelineSql: String =
    s"""WITH RECURSIVE
       |$verdictCtes
       |SELECT doc_id, lang_guess, quality_score, cluster_id, verdict
       |FROM verdicts
       |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x22_curation_pipeline" -> curationPipeline _)

  val oracles: Map[String, String] = Map(
    "x22_curation_pipeline" -> curationPipelineSql)
}
