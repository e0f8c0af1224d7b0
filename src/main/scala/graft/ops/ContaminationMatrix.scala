package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** X172 — contamination matrix: per (training source × evaluation set),
  * the verbatim n-gram overlap exposure — training docs sharing an
  * n-gram with the set, the distinct shared grams, and the doc-level
  * contamination rate. X24 answers the DOC question ("which documents
  * do I drop"); X172 answers the SOURCING question a mixture build asks
  * before weighting (X46/X153): which FEEDS leak which BENCHMARKS, and
  * how badly — a source with a high rate against one suite gets
  * down-weighted or re-crawled, not just spot-cleaned. Zero cells are
  * emitted (a source proven clean against a set is the result).
  *
  * Eval sets: two disjoint deterministic doc_id slices stand in for two
  * benchmark suites ([[EvalSets]] — the X24 stand-in convention; swap
  * the residue predicates for joins against real suites). Training side
  * = documents in NO eval slice.
  *
  * Exactness: gram sets are X24's distinct word-6-grams; all cells are
  * exact i64 distinct counts; the one double is the rate division of
  * identical exact operands.
  *
  * Shape at 100 TB: the eval gram table is benchmark-sized — built once,
  * BROADCAST (`eval-slice` bound class, X24's argument); the corpus
  * streams row-locally through the n-gram explode into the broadcast
  * hash join, and only the (rare by construction) hits shuffle into the
  * (source × set)-bounded cells. The per-source denominators are one
  * map-side-combined aggregate; the matrix is |sources|·|sets| rows
  * completed by a broadcast cross join so clean cells exist.
  *
  * Reference scope: no curation in the reference; engine extension
  * (SURVEY §2.5, the X24/X46/X61/X153 sourcing family).
  */
object ContaminationMatrix {

  val N = Decontam.N

  /** (set name, doc_id residue mod 20) — the two benchmark stand-ins. */
  val EvalSets: Seq[(String, Long)] = Seq("eval_a" -> 0L, "eval_b" -> 7L)

  def contaminationMatrix(spark: SparkSession, dir: String): DataFrame =
    matrixOf(Tables.documents(spark, dir))

  /** Core of X172 over any (doc_id, source, text) frame; test seam. */
  private[graft] def matrixOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val isEval = EvalSets.map { case (_, r) => $"doc_id" % 20 === r }
      .reduce(_ || _)
    val grams = Dedup.ngramsOf(docs, N)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val evalGrams = EvalSets.map { case (name, r) =>
      grams.filter($"doc_id" % 20 === r)
        .select($"sh").distinct()
        .select(lit(name).as("eval_set"), $"sh")
    }.reduce(_ unionByName _)
    val hits = grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("sh"))
      .groupBy($"source", $"eval_set")
      .agg(countDistinct($"doc_id").as("n_contaminated"),
        countDistinct($"sh").as("n_shared_grams"))
    // every source keeps its matrix rows even with zero training mass
    // (a source living entirely inside an eval slice reports
    // n_train_docs = 0 with NULL rate — no exposure, not a clean bill)
    val trainBySource = docs
      .groupBy($"source")
      .agg(sum(when(!isEval, 1L).otherwise(0L)).as("n_train_docs"))
    val sets = EvalSets.map(_._1).toDF("eval_set")
    trainBySource.crossJoin(broadcast(sets))
      .join(hits, Seq("source", "eval_set"), "left")
      .select($"source", $"eval_set", $"n_train_docs",
        coalesce($"n_contaminated", lit(0L)).as("n_contaminated"),
        coalesce($"n_shared_grams", lit(0L)).as("n_shared_grams"),
        when($"n_train_docs" === 0L, lit(null).cast("double"))
          .otherwise(coalesce($"n_contaminated", lit(0L)).cast("double") /
            $"n_train_docs".cast("double")).as("doc_rate"))
      .orderBy($"source", $"eval_set")
  }

  val contaminationMatrixSql: String = {
    val parts = (0 until N).map(j => s"words[i+$j]").mkString(" || ' ' || ")
    val residues = EvalSets.map { case (n, r) =>
      s"SELECT '$n' AS eval_set, $r AS r" }.mkString("\n       | UNION ALL ")
    val anyEval = EvalSets.map { case (_, r) => s"doc_id % 20 = $r" }
      .mkString(" OR ")
    s"""WITH g AS (
       |  SELECT DISTINCT doc_id, $parts AS sh
       |  FROM (SELECT doc_id,
       |               string_split_regex(trim(lower(text)), '\\s+') AS words
       |        FROM documents),
       |       LATERAL unnest(generate_series(1, len(words) - ${N - 1}))
       |         AS u(i)),
       |gs AS (
       |  SELECT g.doc_id, g.sh, d.source
       |  FROM g JOIN documents d ON g.doc_id = d.doc_id),
       |sets AS (
       | $residues),
       |ev AS (
       |  SELECT DISTINCT s.eval_set, gs.sh
       |  FROM gs JOIN sets s ON gs.doc_id % 20 = s.r),
       |hits AS (
       |  SELECT gs.source, ev.eval_set,
       |         CAST(count(DISTINCT gs.doc_id) AS BIGINT) AS n_contaminated,
       |         CAST(count(DISTINCT gs.sh) AS BIGINT) AS n_shared_grams
       |  FROM gs JOIN ev ON gs.sh = ev.sh
       |  WHERE NOT ($anyEval)
       |  GROUP BY 1, 2),
       |train AS (
       |  SELECT source,
       |         CAST(sum(CASE WHEN $anyEval THEN 0 ELSE 1 END) AS BIGINT)
       |           AS n_train_docs
       |  FROM documents
       |  GROUP BY 1)
       |SELECT t.source, s.eval_set, t.n_train_docs,
       |       coalesce(h.n_contaminated, 0) AS n_contaminated,
       |       coalesce(h.n_shared_grams, 0) AS n_shared_grams,
       |       CASE WHEN t.n_train_docs = 0 THEN NULL
       |            ELSE CAST(coalesce(h.n_contaminated, 0) AS DOUBLE)
       |                   / CAST(t.n_train_docs AS DOUBLE) END AS doc_rate
       |FROM train t CROSS JOIN sets s
       |LEFT JOIN hits h ON t.source = h.source AND s.eval_set = h.eval_set
       |ORDER BY t.source, s.eval_set""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x172_contamination_matrix" -> contaminationMatrix _)

  val oracles: Map[String, String] = Map(
    "x172_contamination_matrix" -> contaminationMatrixSql)
}
