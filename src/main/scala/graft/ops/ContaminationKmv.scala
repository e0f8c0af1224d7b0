package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.KmvSketch

/** X176 — KMV estimate of the distinct shared grams per contamination
  * cell: the bounded-state replacement for the ONE X172 column the
  * streaming monitor could not carry. X175's scaladoc names the gap
  * precisely — "a distinct-gram union across docs is not a linear
  * per-doc statistic (a bounded KMV sketch could estimate it)" — and
  * this operator IS that sketch, registered batch-side first so the
  * estimator itself is oracle-audited before the stream trusts it
  * (the X134→X139 discipline: hash-green the batch sketch, then pin
  * the streaming twin bit-equal to it).
  *
  * Per (training source × evaluation set): the k = [[Kmv.K]] smallest
  * [[graft.functions.Hashing.md5Long40]] hashes over the cell's SHARED
  * grams — training-side word-6-gram instances that hit the set's
  * pinned gram table — via the [[graft.functions.KmvSketch]] bounded
  * aggregator (dedup lives inside the aggregator: no upstream distinct,
  * each map task ships ≤ k hashes per cell). Emitted per cell: k_used,
  * kth_hash, and the classic (k−1)·H/h₍ₖ₎ estimate (Bar-Yossef et al.
  * 2002; Beyer et al. 2007) — below capacity the sketch is lossless and
  * est = the exact distinct count by definition.
  *
  * Exactness: hashes are exact i64; k_used and kth_hash are integer
  * order statistics of the distinct-hash SET (the X134 stance), so both
  * engines agree bit-for-bit; est_q is one double division of exact i64
  * operands. The matrix is completed by the X172 convention — every
  * source keeps its |sets| cells; a clean cell reports k_used = 0 with
  * est 0 and NULL kth_hash (nothing was sketched, not an unknown).
  *
  * Shape at 100 TB: the eval gram tables are benchmark-sized broadcasts
  * (X24's argument); the corpus streams row-locally through the gram
  * explode into the broadcast hash join; only the rare-by-construction
  * hits enter the KMV aggregate, which partial-merges to ≤ k longs per
  * (cell, map task) — the wire carries sketches, never the gram stream
  * (X134's window form would shuffle every distinct hit; this is the
  * aggregator form for exactly that reason). Output is |sources|·|sets|
  * rows.
  *
  * Reference scope: no curation in the reference; engine extension
  * (SURVEY §2.5, the X24/X134/X139/X172/X174 sourcing × sketch
  * families).
  */
object ContaminationKmv {

  val N = Decontam.N
  val K = Kmv.K

  def contaminationKmv(spark: SparkSession, dir: String): DataFrame =
    kmvMatrixOf(Tables.documents(spark, dir))

  /** Core of X176 over any (doc_id, source, text) frame; test seam. */
  private[graft] def kmvMatrixOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val isEval = ContaminationMatrix.EvalSets
      .map { case (_, r) => $"doc_id" % 20 === r }.reduce(_ || _)
    val grams = Dedup.ngramsOf(docs, N)
      .join(docs.select($"doc_id", $"source"), Seq("doc_id"))
    val evalGrams = ContaminationMatrix.EvalSets.map { case (name, r) =>
      grams.filter($"doc_id" % 20 === r)
        .select($"sh").distinct()
        .select(lit(name).as("eval_set"), $"sh")
    }.reduce(_ unionByName _)
    val kmv = udaf(new KmvSketch(K))
    val cells = grams.filter(!isEval)
      .join(broadcast(evalGrams), Seq("sh"))
      .select($"source", $"eval_set",
        graft.functions.Hashing.md5Long40($"sh").as("h"))
      .groupBy($"source", $"eval_set")
      .agg(kmv($"h").as("ks"))
      .select($"source", $"eval_set",
        size($"ks").cast("long").as("k_used"),
        element_at($"ks", size($"ks")).as("kth_hash"))
    val sources = docs.select($"source").distinct()
    val sets = ContaminationMatrix.EvalSets.map(_._1).toDF("eval_set")
    sources.crossJoin(broadcast(sets))
      .join(cells, Seq("source", "eval_set"), "left")
      .select($"source", $"eval_set",
        coalesce($"k_used", lit(0L)).as("k_used"),
        $"kth_hash",
        when(coalesce($"k_used", lit(0L)) < K,
          coalesce($"k_used", lit(0L)).cast("double"))
          .otherwise((lit((K - 1).toDouble) * lit((1L << 40).toDouble)) /
            $"kth_hash".cast("double")).as("est_q"))
      .orderBy($"source", $"eval_set")
  }

  val contaminationKmvSql: String = {
    val parts = (0 until N).map(j => s"words[i+$j]").mkString(" || ' ' || ")
    val residues = ContaminationMatrix.EvalSets.map { case (n, r) =>
      s"SELECT '$n' AS eval_set, $r AS r" }.mkString("\n       | UNION ALL ")
    val anyEval = ContaminationMatrix.EvalSets
      .map { case (_, r) => s"doc_id % 20 = $r" }.mkString(" OR ")
    val h = graft.functions.Hashing.sqlMd5Long40("gs.sh")
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
       |hs AS (
       |  SELECT DISTINCT gs.source, ev.eval_set, $h AS h
       |  FROM gs JOIN ev ON gs.sh = ev.sh
       |  WHERE NOT ($anyEval)),
       |r AS (
       |  SELECT source, eval_set, h,
       |         row_number() OVER (PARTITION BY source, eval_set
       |                            ORDER BY h) AS rn
       |  FROM hs),
       |cells AS (
       |  SELECT source, eval_set,
       |         CAST(count(*) AS BIGINT) AS k_used,
       |         CAST(max(h) AS BIGINT) AS kth_hash
       |  FROM r WHERE rn <= $K
       |  GROUP BY 1, 2)
       |SELECT s.source, e.eval_set,
       |       coalesce(c.k_used, 0) AS k_used,
       |       c.kth_hash,
       |       CASE WHEN coalesce(c.k_used, 0) < $K
       |            THEN CAST(coalesce(c.k_used, 0) AS DOUBLE)
       |            ELSE (CAST(${K - 1} AS DOUBLE)
       |                    * CAST(${1L << 40} AS DOUBLE))
       |                   / CAST(c.kth_hash AS DOUBLE) END AS est_q
       |FROM (SELECT DISTINCT source FROM documents) s
       |CROSS JOIN sets e
       |LEFT JOIN cells c ON s.source = c.source AND e.eval_set = c.eval_set
       |ORDER BY s.source, e.eval_set""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x176_contamination_kmv" -> contaminationKmv _)

  val oracles: Map[String, String] = Map(
    "x176_contamination_kmv" -> contaminationKmvSql)
}
