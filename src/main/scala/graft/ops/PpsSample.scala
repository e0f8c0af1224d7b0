package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing

/** X97 — weighted systematic (probability-proportional-to-size)
  * sampling: lay the corpus out on a token-weighted number line in a
  * deterministic pseudo-random order, then take one pick every
  * [[Stride]] tokens — every document's selection count is EXACTLY
  * proportional to its token weight (long docs can be picked more than
  * once; docs with ≥ Stride tokens are picked with certainty). This is
  * the token-budget draw behind mixture construction: X73 apportions
  * BUDGETS across strata, X28/X74 draw uniform WITHIN a stratum — X97
  * is the document-granular PPS draw where the unit of account is the
  * token, not the document (sampling docs uniformly over-weights short
  * docs in token space; PPS is how a "sample 1 of every N tokens"
  * contract is met exactly).
  *
  * Exactness — systematic, not Poisson: the classic weighted draws
  * (Efraimidis–Spirakis u^(1/w) keys, Poisson/Bernoulli per-row) all
  * rank on transcendental floats — the b53-class divergence the exact
  * gate exists to ban. Systematic PPS needs only prefix sums and
  * integer division: pick positions are the multiples of [[Stride]];
  * doc d holding interval [cum, cum+w) receives
  * `⌊(cum+w+S−1)/S⌋ − ⌊(cum+S−1)/S⌋` picks (the +S shift keeps every
  * operand positive so truncating division IS floor division in both
  * engines). The "random" order is the portable `md5Long40` of the
  * doc id (salted) — deterministic, uniform, engine-identical.
  *
  * The GLOBAL PREFIX SUM reuses X26's two-phase decomposition — but
  * where X26 must scan for its key bounds, the hash key's range is
  * KNOWN ([0, 2^40)): bucket by `pid = h div width` with a constant
  * width — zero driver-side scalar fetches, fully deterministic, and
  * order-preserving because (pid asc, (h, doc_id) asc) ⟺ global
  * (h, doc_id) asc. Per-bucket running sums run partition-parallel;
  * bucket offsets compose via the P² triangular scalar join. The
  * DuckDB oracle computes the naive single-sequence window — the
  * decomposition is proven bit-equal by the hash gate.
  *
  * Scale shape: tokenize + hash are row-local in the scan projection;
  * one pid-partitioned window; one P-row broadcast; pick arithmetic is
  * row-local. Nothing global but the final ORDER BY. Result is
  * invariant to the parallelism that sizes the buckets.
  *
  * Reference scope: no sampling ops in the reference; engine extension
  * (SURVEY §2.5, the X28/X73/X74 mixing family).
  */
object PpsSample {

  /** One pick per this many tokens of the shuffled corpus stream. */
  val Stride = 256L
  private val Salt = "x97|"
  private val HashSpace = 1L << 40

  def ppsSample(spark: SparkSession, dir: String): DataFrame =
    ppsSampleOf(Tables.documents(spark, dir), Stride)

  /** Core over any (doc_id, text) frame; test seam. Emits the full
    * per-document ledger (weight, start offset on the shuffled token
    * line, pick count) ordered by doc_id.
    */
  private[graft] def ppsSampleOf(docs: DataFrame, stride: Long): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val parallelism = spark.sparkContext.defaultParallelism
    val width = HashSpace / parallelism + 1L
    val keyed = docs.select(
      $"doc_id",
      size(split(trim(lower($"text")), "\\s+")).cast("long").as("w"),
      Hashing.md5Long40(concat(lit(Salt), $"doc_id".cast("string"))).as("h"))
      .withColumn("pid", expr(s"h div ${width}L"))
      .localCheckpoint()
    val localW = Window.partitionBy($"pid").orderBy($"h", $"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = keyed.withColumn("local_cum",
      coalesce(sum($"w").over(localW), lit(0L)))
    val partials = keyed.groupBy($"pid").agg(sum($"w").as("psum"))
    val offsets = partials.as("a")
      .join(partials.as("b"), col("b.pid") < col("a.pid"), "left")
      .groupBy(col("a.pid").as("pid"))
      .agg(coalesce(sum(col("b.psum")), lit(0L)).as("part_offset"))
    local.join(broadcast(offsets), "pid")
      .withColumn("cum", $"part_offset" + $"local_cum")
      .select($"doc_id", $"w".as("n_tokens"), $"cum".as("start_w"),
        (expr(s"(cum + w + ${stride - 1}L) div ${stride}L")
          - expr(s"(cum + ${stride - 1}L) div ${stride}L")).as("n_picks"))
      .withColumn("selected", ($"n_picks" > 0).cast("boolean"))
      .orderBy($"doc_id")
  }

  val ppsSampleSql: String = {
    val h = Hashing.sqlMd5Long40(s"'$Salt' || CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
       |  SELECT doc_id,
       |         CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
       |           AS BIGINT) AS w,
       |         $h AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, w,
       |         CAST(coalesce(sum(w) OVER (ORDER BY h, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS cum
       |  FROM t)
       |SELECT doc_id, w AS n_tokens, cum AS start_w,
       |       (cum + w + ${Stride - 1}) // $Stride
       |         - (cum + ${Stride - 1}) // $Stride AS n_picks,
       |       ((cum + w + ${Stride - 1}) // $Stride
       |         - (cum + ${Stride - 1}) // $Stride) > 0 AS selected
       |FROM c
       |ORDER BY doc_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x97_pps_sample" -> ppsSample _)

  val oracles: Map[String, String] = Map(
    "x97_pps_sample" -> ppsSampleSql)
}
