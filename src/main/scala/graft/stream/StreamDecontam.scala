package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{ContaminationMatrix, Decontam}

/** X174/X175/X177 — streaming decontamination: the sourcing family's
  * live members (round-14 verdict items 2 and 8, plus the bounded-KMV
  * closure of the one column X175 declared unstreamable). X24/X172 are
  * batch audits;
  * the production ingest path wants the filter ON the stream — a doc
  * sharing a long n-gram with a benchmark suite should be flagged the
  * moment it arrives, not at the nightly audit.
  *
  * X174 — the per-document guard: incoming docs' distinct word-6-grams
  * against the PINNED eval-gram sets, fully STATELESS. The eval sets
  * are benchmark-sized and static (X24's eval-slice argument), so each
  * set is ONE static row carrying its whole distinct-gram array
  * ([[evalGramSets]] — built once at calibration, broadcast); the
  * stream side builds each doc's gram array ROW-LOCALLY (the
  * zip-of-shifted-slices construction, no explode/re-aggregate — a
  * per-doc aggregation would be unbounded state), cross-joins the
  * |sets| static rows, and flags by one row-local array_intersect.
  * Append mode, no watermark, zero state rows: the guard adds NOTHING
  * to the stream's state story at any corpus size.
  *
  * X175 — the per-source rate monitor: X174's flags folded into the
  * X167-style plain-SUM state — per (source, eval_set), training docs
  * seen and training docs contaminated, and their rate: the live
  * counterpart of X172's matrix cells (same LEFT-of-nothing alarm
  * convention: a source×set cell exists for every streamed source, a
  * clean cell reports rate 0, an all-eval source reports NULL). SUM
  * state is linear, so streamed ≡ batch X172 is BIT-equal on the
  * shared columns. X172's n_shared_grams column is deliberately NOT
  * streamed: a distinct-gram union across docs is not a linear per-doc
  * statistic (a bounded KMV sketch — X139's state — could estimate it;
  * the exact word stays the nightly batch audit's job).
  *
  * Semantics note: is_eval marks membership in ANY pinned set (X172's
  * training-side definition). With a SINGLE pinned set this coincides
  * exactly with X24's per-doc convention — the spec pins the guard
  * bit-equal to X24's flags on the eval_a set, and the monitor
  * bit-equal to X172's cells, across a micro-batch boundary.
  *
  * Reference scope: the reference validates nothing on its stream;
  * engine extension (SURVEY §2.5, the X24/X46/X153/X172 sourcing
  * family's streaming closure).
  */
object StreamDecontam {

  val N = Decontam.N

  /** The pinned static side: one row per eval set carrying the set's
    * whole distinct-gram array plus the residue list every row needs
    * for the ANY-set is_eval test. Built once at calibration time from
    * the benchmark corpus (batch), broadcast into the stream join.
    */
  def evalGramSets(docs: DataFrame,
      sets: Seq[(String, Long)] = ContaminationMatrix.EvalSets): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val allRs = sets.map(_._2)
    sets.map { case (name, r) =>
      graft.ops.Dedup.ngramsOf(docs.filter($"doc_id" % 20 === r), N)
        .agg(array_sort(collect_set($"sh")).as("egrams"))
        .select(lit(name).as("eval_set"), lit(r).as("r"),
          typedLit(allRs).as("all_rs"), $"egrams")
    }.reduce(_ unionByName _)
  }

  /** X174: per-(doc × set) contamination flags over a (streaming or
    * batch) documents-shaped frame — stateless (see scaladoc). Columns
    * per X24's convention generalized to sets: is_eval = in ANY pinned
    * slice (training-side definition), n_shared = distinct grams shared
    * with THIS set (0 for eval docs — they are the benchmark, not a
    * leak), contaminated = training doc with any overlap.
    */
  def decontamGuard(docs: DataFrame, evalSets: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = split(trim(lower($"text")), "\\s+")
    val len = greatest(size($"words") - (N - 1), lit(0))
    docs
      .withColumn("words", words)
      .withColumn("grams", array_distinct(transform(
        arrays_zip((0 until N).map(j => slice($"words", lit(j + 1), len)): _*),
        z => concat_ws(" ", (0 until N).map(j => z.getField(s"$j")): _*))))
      .crossJoin(broadcast(evalSets))
      .withColumn("is_eval", array_contains($"all_rs", $"doc_id" % 20))
      .withColumn("n_shared",
        when($"is_eval", lit(0L))
          .otherwise(size(array_intersect($"grams", $"egrams")).cast("long")))
      .select($"doc_id", $"source", $"eval_set", $"is_eval", $"n_shared",
        ($"n_shared" > 0L && !$"is_eval").as("contaminated"))
  }

  /** X177: live per-(source, eval_set) KMV estimate of the DISTINCT
    * shared grams — the column X175 deliberately could not stream, now
    * carried by the bounded sketch X175's scaladoc pointed at. Each
    * doc's shared grams come row-locally from the X174 intersect (an
    * eval doc shares nothing by the training-side convention), explode
    * statelessly into (cell, md5Long40 hash) rows, and fold into ONE
    * ≤[[graft.ops.Kmv.K]]-slot [[graft.functions.KmvSketch]] buffer per
    * cell — dedup lives inside the aggregator, and the bottom-k union
    * law (X135/X138) makes the result independent of the micro-batch
    * slicing, so streamed ≡ the batch X176 BIT-equal on every emitted
    * column. Cells that never see a shared gram hold no state and emit
    * no row (X176's completed zero cells are exactly the absent ones —
    * the spec pins both directions); complete mode, state_rows = the
    * leaky cells only.
    */
  def sharedGramKmv(docs: DataFrame, evalSets: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val k = graft.ops.Kmv.K
    val kmv = udaf(new graft.functions.KmvSketch(k))
    val words = split(trim(lower($"text")), "\\s+")
    val len = greatest(size($"words") - (N - 1), lit(0))
    docs
      .withColumn("words", words)
      .withColumn("grams", array_distinct(transform(
        arrays_zip((0 until N).map(j => slice($"words", lit(j + 1), len)): _*),
        z => concat_ws(" ", (0 until N).map(j => z.getField(s"$j")): _*))))
      .crossJoin(broadcast(evalSets))
      .filter(!array_contains($"all_rs", $"doc_id" % 20))
      .select($"source", $"eval_set",
        explode(array_intersect($"grams", $"egrams")).as("sh"))
      .select($"source", $"eval_set",
        graft.functions.Hashing.md5Long40($"sh").as("h"))
      .groupBy($"source", $"eval_set")
      .agg(kmv($"h").as("ks"))
      .select($"source", $"eval_set",
        size($"ks").cast("long").as("k_used"),
        element_at($"ks", size($"ks")).as("kth_hash"))
      .withColumn("est_q",
        when($"k_used" < k, $"k_used".cast("double"))
          .otherwise((lit((k - 1).toDouble) * lit((1L << 40).toDouble)) /
            $"kth_hash".cast("double")))
  }

  /** X175: live per-(source, eval_set) contamination-rate cells — the
    * streaming counterpart of X172's matrix on the linear columns
    * (plain SUM state; one row per streamed source × set). */
  def contaminationMonitor(docs: DataFrame, evalSets: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    decontamGuard(docs, evalSets)
      .groupBy($"source", $"eval_set")
      .agg(
        sum(when(!$"is_eval", 1L).otherwise(0L)).as("n_train_docs"),
        sum(when($"contaminated", 1L).otherwise(0L)).as("n_contaminated"))
      .select($"source", $"eval_set", $"n_train_docs", $"n_contaminated",
        when($"n_train_docs" === 0L, lit(null).cast("double"))
          .otherwise($"n_contaminated".cast("double") /
            $"n_train_docs".cast("double")).as("doc_rate"))
  }
}
