package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X158 — per-source Heaps-law fit: the growth exponent β of vocabulary
  * size against tokens ingested (V(n) ≈ K·n^β, Heaps 1978; natural
  * language sits at β ≈ 0.4–0.6) — the capacity-planning statistic for
  * everything vocabulary-bounded in this engine (the `vocab`-class
  * broadcasts, BPE merges, inverted indexes): a feed whose β drifts
  * toward 1 is minting tokens (ids, hashes, boilerplate-noise) and
  * will not saturate; one near 0 is a template loop. X154 reads the
  * STATIC shape of the frequency law; X158 reads its GROWTH curve.
  *
  * Construction — one pass, no per-checkpoint rescans: each word's
  * first-occurrence document (min doc_id per (source, word)) turns the
  * vocabulary curve into a running sum — vocab after doc d = Σ
  * new_words(d' ≤ d) — and tokens after doc d is the running sum of
  * per-doc token counts, both over the same per-source doc_id window;
  * every document then yields one exact (tokens_so_far, vocab_so_far)
  * checkpoint, and the fit is X154's decimal OLS verbatim
  * ([[Zipf.olsFit]]) on (ln n, ln V).
  *
  * Exactness: checkpoints are exact i64 window sums with the total
  * (doc_id) order; ln absorbed by i64 quantization at 1e6; the OLS
  * closed forms run in exact decimal-integer arithmetic (the Spearman
  * mechanism — no float sum, no cross-engine a·b − c·d double).
  * Single-doc sources fit on one point ⇒ NULL by the shared
  * zero-variance guard.
  *
  * Scale shape (round-13 verdict item 1): tokenize/explode row-local;
  * first-occurrence and per-doc counts are map-side-combined
  * aggregates. The running sums are X26's bucketed distributed prefix
  * sum ([[Packing.packingCoreOf]]'s mechanism), NOT a
  * `partitionBy(source)` window — that shape funnels corpus-linear
  * per-document rows through |sources| single-task sorts at 100 TB.
  * Here: a row-local bucket id from the doc_id range, per-(source,
  * bucket) running sums in parallel windows, per-(source, bucket)
  * totals joined triangularly into each bucket's starting offsets
  * (|sources|·|buckets| scalar rows, broadcast back — `parallelism`
  * bound class), and a row-local final add. The OLS is one
  * |sources|-group aggregate over doc-count rows. Output is |sources|
  * rows. The one driver fetch is the doc_id min/max scalar (parquet
  * footer stats at cluster scale — the X26-documented exception).
  *
  * Reference scope: no text analytics in the reference; engine
  * extension (SURVEY §2.5, the X154/X107 vocabulary-statistics family).
  */
object Heaps {

  def heapsFit(spark: SparkSession, dir: String): DataFrame =
    heapsFitOf(Tables.documents(spark, dir))

  /** Core of X158 over any (source, doc_id, text) frame. */
  private[graft] def heapsFitOf(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    // row-local, order-preserving bucket id from the doc_id range —
    // X26's deterministic bucketing (pid asc, doc_id asc ⟺ doc_id asc
    // within a source), anchored on one scalar min/max fetch
    val bounds = docs.agg(
      min($"doc_id").cast("long"), max($"doc_id").cast("long"))
      .collect()(0)
    if (bounds.isNullAt(0)) {
      // empty input: no anchor for the bucket width; the fit is empty
      return Zipf.olsFit(docs
        .select($"source", lit(0L).as("x"), lit(0L).as("y"))
        .where(lit(false)), "n_points").orderBy($"source")
    }
    val (mn, mx) = (bounds.getLong(0), bounds.getLong(1))
    val width = math.max(1L, (mx - mn) / parallelism + 1L)
    val tok = docs
      .select($"source", $"doc_id",
        explode(split(lower($"text"), "\\s+")).as("word"))
      .filter($"word" =!= "")
    // per-doc token counts and per-doc NEW-word counts (a word is new
    // in the doc where it first appears — min doc_id per word)
    val perDoc = tok.groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_tok"))
    val firstDoc = tok.groupBy($"source", $"word")
      .agg(min($"doc_id").as("doc_id"))
      .groupBy($"source", $"doc_id")
      .agg(count(lit(1)).as("n_new"))
    // materialize: the checkpoint rows feed both the local-window branch
    // and the per-bucket totals branch (the X26 two-consumer pattern) —
    // without it the tokenize+aggregate lineage runs twice. localCheckpoint
    // (the LloydIvf pattern), NOT cache(): a cache inside a registered
    // query outlives the query as a session-lifetime InMemoryRelation
    // (round-14 verdict item 1) — checkpoint blocks are reclaimed by the
    // context cleaner once the frame is unreachable
    val base = perDoc
      .join(firstDoc, Seq("source", "doc_id"), "left")
      .select($"source", $"doc_id", $"n_tok",
        coalesce($"n_new", lit(0L)).as("n_new"))
      .withColumn("pid", expr(s"(doc_id - ${mn}L) div ${width}L"))
      .localCheckpoint()
    // phase 2: per-(source, bucket) INCLUSIVE running sums — windows
    // keyed by (source, pid) run in parallel across buckets
    val localW = Window.partitionBy($"source", $"pid").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = base
      .withColumn("loc_tok", sum($"n_tok").over(localW))
      .withColumn("loc_new", sum($"n_new").over(localW))
    // phase 3: per-(source, bucket) totals → triangular join within
    // each source → each bucket's starting offsets (|sources|·P rows)
    val partials = base.groupBy($"source", $"pid")
      .agg(sum($"n_tok").as("ptok"), sum($"n_new").as("pnew"))
    val offsets = partials.as("a")
      .join(partials.as("b"),
        col("a.source") === col("b.source") &&
          col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.source").as("source"), col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.ptok")), lit(0L)).as("off_tok"),
        coalesce(sum(col("b.pnew")), lit(0L)).as("off_new"))
    // phase 4: compose row-locally — identical i64 running sums to the
    // single-window form (HeapsSpec pins the equivalence; the DuckDB
    // oracle keeps the naive window, so the hash gate proves it too)
    val pts = local.join(broadcast(offsets), Seq("source", "pid"))
      .select($"source",
        round(log(($"off_tok" + $"loc_tok").cast("double")) * 1e6)
          .cast("long").as("x"),
        round(log(($"off_new" + $"loc_new").cast("double")) * 1e6)
          .cast("long").as("y"))
    Zipf.olsFit(pts, "n_points").orderBy($"source")
  }

  val heapsFitSql: String =
    s"""WITH tok AS (
       |  SELECT source, doc_id, word
       |  FROM (SELECT source, doc_id,
       |               unnest(string_split_regex(lower(text), '\\s+'))
       |                 AS word
       |        FROM documents)
       |  WHERE word <> ''),
       |pd AS (
       |  SELECT source, doc_id, count(*) AS n_tok
       |  FROM tok GROUP BY 1, 2),
       |fd AS (
       |  SELECT source, doc_id, count(*) AS n_new
       |  FROM (SELECT source, word, min(doc_id) AS doc_id
       |        FROM tok GROUP BY 1, 2)
       |  GROUP BY 1, 2),
       |cum AS (
       |  SELECT pd.source,
       |         sum(pd.n_tok) OVER (PARTITION BY pd.source
       |           ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING)
       |           AS cum_tok,
       |         sum(coalesce(fd.n_new, 0)) OVER (PARTITION BY pd.source
       |           ORDER BY pd.doc_id ROWS UNBOUNDED PRECEDING)
       |           AS cum_vocab
       |  FROM pd LEFT JOIN fd
       |    ON pd.source = fd.source AND pd.doc_id = fd.doc_id),
       |pts AS (
       |  SELECT source,
       |         CAST(round(ln(cum_tok) * 1000000) AS BIGINT) AS x,
       |         CAST(round(ln(cum_vocab) * 1000000) AS BIGINT) AS y
       |  FROM cum),
       |${Zipf.olsSqlTail("pts", "n_points")}""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x158_heaps_fit" -> heapsFit _)

  val oracles: Map[String, String] = Map(
    "x158_heaps_fit" -> heapsFitSql)
}
