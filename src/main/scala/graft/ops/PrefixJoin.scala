package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** X62 — prefix-filtered exact set-similarity self-join (the
  * AllPairs/PPJoin candidate rule): every document pair with shingle
  * Jaccard ≥ τ = 1/2, found WITHOUT all-pairs comparison and WITHOUT
  * loss. Completes the near-dup join family: X2 is probabilistic
  * (MinHash banding can miss), x17 bounds recall by a declared
  * rare-shingle boundary (df ≤ 5), x32 is lossless but for Hamming
  * distance on fixed-width fingerprints — this one is lossless at an
  * exact Jaccard threshold on the raw sets.
  *
  * The filter: order the universe by a fixed global total order —
  * (corpus df ascending, shingle) = rarest first — and keep each
  * document's first `p = n − ⌈τ·n⌉ + 1` shingles. For any pair with
  * J ≥ τ, the intersection has `i ≥ ⌈τ·max(n_a,n_b)⌉` elements
  * (J = i/u and u ≥ max), so the SMALLEST common shingle sits within
  * position `n − i + 1 ≤ p` of BOTH sets — some prefix shingle is
  * shared, and the prefix equi-join finds every qualifying pair
  * (pigeonhole; no loss). Rarest-first is what makes the candidate
  * join sparse: prefix df² drives its size, and hot shingles fall out
  * of every prefix. τ = 1/2 keeps all bounds exact-integer:
  * ⌈n/2⌉ = (n+1) div 2, the size filter is n_a ≤ 2·n_b ∧ n_b ≤ 2·n_a,
  * and the verify is 2·i ≥ n_a + n_b − i. No float ever decides.
  *
  * Scale shape: df is a groupBy + token-keyed join (never a PARTITION
  * BY sh window — the x17 hot-key lesson); position/size windows are
  * doc-partitioned; candidates and the two verify joins move candidate
  * cardinality, not the corpus. The DuckDB oracle is the pure
  * quadratic brute force — the driver's hash gate literally proves
  * the pruned plan equals all-pairs.
  */
object PrefixJoin {

  def prefixSimJoin(spark: SparkSession, dir: String): DataFrame =
    prefixSimJoinSh(CorpusIndex.shingles(spark, dir), ScaleCaps.maxCandDf)

  /** Core of X62 over any (doc_id, text, …) frame; test/scale seam. */
  def prefixSimJoinOf(docs: DataFrame): DataFrame =
    prefixSimJoinOf(docs, Long.MaxValue)

  /** X62 with the candidate-budget escape hatch engaged.
    *
    * `maxCandDf` bounds CANDIDATE GENERATION (x43's map-side-cap
    * pattern, applied to the prefix index): shingles whose corpus df
    * exceeds it are dropped from the prefix index — never from the
    * verify joins, which stay exact on every surviving candidate. The
    * candidate join is then ≤ maxCandDf² pairs per distinct shingle,
    * LINEAR in vocabulary size no matter how df distributions shift at
    * 100× — the declared-recall degradation mode for open-scale runs.
    * A qualifying pair is missed only when EVERY prefix shingle it
    * shares is hotter than the cap; at τ = 1/2 near-dup pairs share
    * many predominantly-rare shingles, so the loss concentrates on
    * pairs whose entire overlap is boilerplate. `Long.MaxValue` (the
    * 1-arg form) keeps the filter out of the plan entirely — bit-equal
    * to the lossless join, which the driver's brute-force oracle and
    * PrefixJoinSpec pin.
    */
  def prefixSimJoinOf(docs: DataFrame, maxCandDf: Long): DataFrame =
    prefixSimJoinSh(Dedup.shinglesOf(docs).cache(), maxCandDf)

  /** X62 over a pre-materialized (doc_id, sh) shingle frame — the
    * registered query reads the shared [[CorpusIndex]] checkpoint (the
    * corpus is shingled once per session/dir, not once per family
    * member); the `Of` seams above self-cache for arbitrary inputs.
    */
  private[graft] def prefixSimJoinSh(tok: DataFrame, maxCandDf: Long): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    val cand = candidatesSh(tok, maxCandDf)

    // Verify stays in the expanded-join form DELIBERATELY (round-18
    // optimization): the set-array alternative (sorted arrays +
    // native merge-count) measured slower at bench scale — see the
    // note in Dedup.exactJaccard. The round's win here is the
    // checkpointed candidate index (one window/df pass, not two).
    cand
      .join(tok.select($"doc_id".as("doc_a"), $"sh"), Seq("doc_a"))
      .join(tok.select($"doc_id".as("doc_b"), $"sh"), Seq("doc_b", "sh"))
      .groupBy($"doc_a", $"doc_b")
      .agg(max($"n_sh_a").as("n_sh_a"), max($"n_sh_b").as("n_sh_b"),
        count(lit(1)).as("n_common"))
      .where(lit(2) * $"n_common" >= $"n_sh_a" + $"n_sh_b" - $"n_common")
      .select($"doc_a", $"doc_b", $"n_sh_a", $"n_sh_b", $"n_common",
        ($"n_common".cast("double") /
          ($"n_sh_a" + $"n_sh_b" - $"n_common").cast("double"))
          .as("jaccard"))
      .orderBy($"doc_a", $"doc_b")
  }

  /** The verified-candidate stream of [[prefixSimJoinSh]] — the frame
    * whose cardinality IS the join's scale cost (Σ_sh df_prefix²
    * lossless, ≤ maxCandDf² per shingle capped). Factored out so the
    * pair-count-vs-SF growth evidence (graft.CandGrowth → SCALE.md)
    * measures exactly what the registered query executes.
    */
  private[graft] def candidatesSh(tok: DataFrame, maxCandDf: Long): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    // Materialize the prefix index ONCE (projected to the four columns
    // the join reads): both sides of the self-join below consume it,
    // and self-join plan instances cannot share exchanges once one
    // side is broadcast — without the checkpoint the df aggregate +
    // doc windows run twice per execution (guide §2.4: remove repeated
    // subtree computation outright). PrefixJoinSpec pins the window
    // discipline on the pre-checkpoint [[prefixIndexSh]] seam.
    val prefix = prefixIndexSh(tok, maxCandDf).localCheckpoint()

    // positional upper bound (PPJoin): a pair with J ≥ τ needs overlap
    // α = ⌈(n_a+n_b)/3⌉ (τ = 1/2); common shingles all sit at/after the
    // matched positions, so overlap ≤ min(n_a−pos_a, n_b−pos_b)+1 — the
    // smallest common shingle always passes when J ≥ τ (lossless), and
    // most spurious prefix collisions die before the verify joins
    prefix.select($"doc_id".as("doc_a"), $"sh",
        $"n".as("n_sh_a"), $"pos".as("pos_a"))
      .join(prefix.select($"doc_id".as("doc_b"), $"sh",
        $"n".as("n_sh_b"), $"pos".as("pos_b")), Seq("sh"))
      .where($"doc_a" < $"doc_b" &&
        $"n_sh_a" <= $"n_sh_b" * 2 && $"n_sh_b" <= $"n_sh_a" * 2 &&
        (least($"n_sh_a" - $"pos_a", $"n_sh_b" - $"pos_b") + 1) * 3 >=
          $"n_sh_a" + $"n_sh_b")
      .select($"doc_a", $"doc_b", $"n_sh_a", $"n_sh_b").distinct()
  }

  /** The un-checkpointed prefix index (doc_id, sh, n, pos) behind
    * [[candidatesSh]]: corpus df (groupBy + token-keyed join — never a
    * PARTITION BY sh window), doc-partitioned size/position windows,
    * the τ = 1/2 prefix budget, and the candidate-df cap when engaged.
    * Factored out so PrefixJoinSpec can pin the window discipline on
    * the frame the checkpoint materializes.
    */
  private[graft] def prefixIndexSh(tok: DataFrame, maxCandDf: Long): DataFrame = {
    val spark = tok.sparkSession
    import spark.implicits._
    val df = tok.groupBy($"sh").agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy($"doc_id")
    val ranked = tok.join(df, Seq("sh"))
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("pos",
        row_number().over(wDoc.orderBy($"df", $"sh")))
    val inBudget = ranked
      .where($"pos" <= expr("n - ((n + 1) div 2) + 1"))
    (if (maxCandDf == Long.MaxValue) inBudget
     else inBudget.where($"df" <= maxCandDf))
      .select($"doc_id", $"sh", $"n", $"pos")
  }

  /** Pure all-pairs brute force — proving the prefix filter lossless. */
  val prefixSimJoinSql: String =
    s"""WITH ${Dedup.shinglesSqlFrom("documents")},
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |cand AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |         count(*) AS n_common
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b, sa.n AS n_sh_a, sb.n AS n_sh_b, n_common,
       |       CAST(n_common AS DOUBLE)
       |         / CAST(sa.n + sb.n - n_common AS DOUBLE) AS jaccard
       |FROM cand
       |JOIN sz sa ON doc_a = sa.doc_id
       |JOIN sz sb ON doc_b = sb.doc_id
       |WHERE 2 * n_common >= sa.n + sb.n - n_common
       |ORDER BY doc_a, doc_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x62_setsim_prefix_join" -> prefixSimJoin _)

  val oracles: Map[String, String] = Map(
    "x62_setsim_prefix_join" -> prefixSimJoinSql)
}
