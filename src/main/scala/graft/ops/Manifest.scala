package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X91 — the composed training-data build: the end-to-end "pipeline of
  * pipelines" that strings the already-verified stages into ONE manifest
  * a training job consumes directly, proving the operators compose
  * without re-reads. Stages, each consuming the previous stage's frame
  * and the shared memoized corpus artifacts (never the raw table twice):
  *
  *  1. curation (X22 core): quality gate → exact dedup → near-dup
  *     clustering → per-doc verdict, riding [[CorpusIndex.shingles]]
  *     (tokenize-once);
  *  2. split assignment (X61's row-local 80/10/10 hash — no split
  *     table, no join);
  *  3. leakage repair (X66 semantics restricted to curation survivors):
  *     a kept TRAIN doc with an X2-verified near-dup link to a kept
  *     val/test doc is dropped — the pair evidence is the memoized
  *     [[CorpusIndex.minhashScores]] stream, computed zero extra times;
  *  4. packing (X26 core): the final train survivors are laid out into
  *     fixed-capacity token windows by the partition-parallel prefix-sum
  *     decomposition — only these docs are re-tokenized for counts, and
  *     only here does `text` get re-attached (one semi-join by doc_id).
  *
  * Output: every input document with (lang_guess, quality_score, split,
  * verdict, n_leak_links, action, n_tokens, pack_id, offset_in_pack) —
  * the pack columns non-null exactly for the docs a training job reads.
  * `action` ∈ {dropped (failed curation), eval (kept, val/test),
  * leak_drop (kept train, leaks into eval), train (kept, clean)}.
  *
  * At 100 TB: stage 1's cost is the X22 cost (already bucketed/banded);
  * stages 2-3 move pair cardinality only; stage 4 is two window passes
  * partitioned by a row-local bucket key. The only document-cardinality
  * joins are keyed on doc_id. Nothing here re-derives what a prior stage
  * (or the shared corpus index) already computed — the artifact-flow
  * shape a production build wants.
  *
  * The DuckDB oracle recomputes the whole composition independently:
  * the x22 recursive-CTE verdict chain, the split CASE, the X2 LSH
  * pair CTE, and the naive single-sequence prefix sum that x26's
  * decomposition is proven bit-equal to.
  *
  * Reference scope: the reference repo (a single streaming envelope
  * pipeline) has no curation build; this composition is the capstone of
  * the mandated LLM-pipeline extension set (SURVEY §2.5), built
  * entirely from verified stages.
  */
object Manifest {

  def pipelineManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)

    // stage 1+2: the shared memoized curation verdict artifact (computed
    // once per (session, dir) — x22 reads the same frame) + row-local split
    val tagged = CorpusIndex.curationVerdicts(spark, dir)
      .select($"doc_id", $"lang_guess", $"quality_score", $"verdict",
        SplitLeakage.splitOf($"doc_id").as("split"))

    // stage 3: leakage among the KEPT survivors only, over the memoized
    // X2 pair stream (two doc_id-keyed joins against a slim 2-col frame)
    val kept = tagged.filter($"verdict" === "kept")
      .select($"doc_id", $"split")
    val pairs = CorpusIndex.minhashScores(spark, dir)
      .filter($"jaccard" >= 0.5)
      .select($"doc_a", $"doc_b")
    val keptPairs = pairs
      .join(kept.select($"doc_id".as("doc_a"), $"split".as("sa")), Seq("doc_a"))
      .join(kept.select($"doc_id".as("doc_b"), $"split".as("sb")), Seq("doc_b"))
    // both leak directions from ONE pass over the joined pair stream
    // (round-18 optimization): the union-of-two-filters form executed
    // the pairs⋈kept⋈kept chain once per arm (the arms are mutually
    // exclusive — sb ≠ train vs sb = train — so the per-doc counts are
    // identical)
    val leaks = keptPairs
      .select(explode(array(
        when($"sa" === "train" && $"sb" =!= "train", $"doc_a"),
        when($"sb" === "train" && $"sa" =!= "train", $"doc_b")))
        .as("doc_id"))
      .filter($"doc_id".isNotNull)
      .groupBy($"doc_id").agg(count(lit(1)).as("n_leak_links"))

    val acted = tagged.join(leaks, Seq("doc_id"), "left")
      .withColumn("n_leak_links", coalesce($"n_leak_links", lit(0L)))
      .withColumn("action",
        when($"verdict" =!= "kept", "dropped")
          .when($"split" =!= "train", "eval")
          .when($"n_leak_links" > 0, "leak_drop")
          .otherwise("train"))

    // stage 4: pack ONLY the final train survivors — text re-attaches
    // here and nowhere else (left_semi by doc_id), and the layout comes
    // from the partition-parallel x26 core (no presentation sort inside)
    val trainDocs = docs.join(
      acted.filter($"action" === "train").select($"doc_id"),
      Seq("doc_id"), "left_semi")
    val packed = Packing.packingCoreOf(trainDocs, Packing.PackCapacity)
      .select($"doc_id", $"n_tokens", $"pack_id", $"offset_in_pack")

    acted.join(packed, Seq("doc_id"), "left")
      .select($"doc_id", $"lang_guess", $"quality_score", $"split",
        $"verdict", $"n_leak_links", $"action",
        $"n_tokens", $"pack_id", $"offset_in_pack")
      .orderBy($"doc_id")
  }

  val pipelineManifestSql: String = {
    def s(c: String) = SplitLeakage.sqlSplitOf(c)
    s"""WITH RECURSIVE
       |${Curation.verdictCtes},
       |tagged AS MATERIALIZED (
       |  SELECT doc_id, lang_guess, quality_score, verdict,
       |         ${s("doc_id")} AS split
       |  FROM verdicts),
       |mh AS MATERIALIZED (
       |${Dedup.minhashLshSqlWith(false)}
       |),
       |kept AS MATERIALIZED (SELECT doc_id, split FROM tagged WHERE verdict = 'kept'),
       |keptpairs AS (
       |  SELECT ka.split AS sa, kb.split AS sb, p.doc_a, p.doc_b
       |  FROM mh p
       |  JOIN kept ka ON p.doc_a = ka.doc_id
       |  JOIN kept kb ON p.doc_b = kb.doc_id),
       |leaks AS (
       |  SELECT doc_id, count(*) AS n_leak_links FROM (
       |    SELECT doc_a AS doc_id FROM keptpairs
       |    WHERE sa = 'train' AND sb <> 'train'
       |    UNION ALL
       |    SELECT doc_b FROM keptpairs
       |    WHERE sb = 'train' AND sa <> 'train'
       |  ) GROUP BY 1),
       |acted AS MATERIALIZED (
       |  SELECT g.doc_id, g.lang_guess, g.quality_score, g.split,
       |         g.verdict,
       |         coalesce(l.n_leak_links, 0) AS n_leak_links,
       |         CASE WHEN g.verdict <> 'kept' THEN 'dropped'
       |              WHEN g.split <> 'train' THEN 'eval'
       |              WHEN coalesce(l.n_leak_links, 0) > 0 THEN 'leak_drop'
       |              ELSE 'train' END AS action
       |  FROM tagged g LEFT JOIN leaks l ON g.doc_id = l.doc_id),
       |traintoks AS (
       |  SELECT d.doc_id,
       |         CAST(len(string_split_regex(trim(lower(d.text)), '\\s+'))
       |           AS BIGINT) AS n_tokens
       |  FROM documents d
       |  JOIN acted a ON d.doc_id = a.doc_id AND a.action = 'train'),
       |packedcte AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS start_offset
       |  FROM traintoks)
       |SELECT a.doc_id, a.lang_guess, a.quality_score, a.split, a.verdict,
       |       a.n_leak_links, a.action,
       |       p.n_tokens,
       |       p.start_offset // ${Packing.PackCapacity} AS pack_id,
       |       p.start_offset % ${Packing.PackCapacity} AS offset_in_pack
       |FROM acted a
       |LEFT JOIN packedcte p ON a.doc_id = p.doc_id
       |ORDER BY a.doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x91_pipeline_manifest" -> pipelineManifest _)

  val oracles: Map[String, String] = Map(
    "x91_pipeline_manifest" -> pipelineManifestSql)
}
