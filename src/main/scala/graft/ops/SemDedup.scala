package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Hashing._

/** X145 — SemDeDup: cluster-then-dedupe semantic deduplication (Abbas
  * et al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication"). Embedding-space near-duplicates are found
  * WITHIN k-means cells only — the cells make the quadratic pair search
  * tractable (pairs are C(cell,2), never C(corpus,2)) — then each
  * duplicate group keeps its LEAST centroid-like member (lowest cosine
  * to the cell centroid, the paper's keep-low-similarity diversity
  * rule) and drops the rest.
  *
  * How this differs from the other embedding dedups: X20 blocks pairs
  * by the DECLARED label and keeps no one (it only labels clusters);
  * X145 blocks by the COMPUTED nearest-centroid cell (X70's E-step —
  * no labels consulted at decision time) and emits the keep/drop
  * verdict. The oracle stays fully deterministic because the cells are
  * the label-SEEDED centroids (X70's hash-green chain, reused verbatim:
  * same centroid means, same quantized distance, same (dist_q, c_label)
  * argmin); X19's learned-IVF path is the same shape with trained
  * cells, declared rows-only for exactly the float-order reason this
  * op avoids.
  *
  * Exactness: every similarity is the engine-portable quantized cosine
  * (cosQ over exact-i64 dotQ operands — the X4 float license), the
  * keep rule's argmin key (cos_cent, vec_id) is total, and the
  * duplicate groups are connected components over the within-cell
  * threshold pairs (Dedup.connectedComponents; oracle = the X20
  * unrolled recursive-reach replay, cluster id = least member).
  *
  * Scale shape: centroids are ONE mergeable (label, dim) aggregate
  * broadcast at |cells| rows (X36/X70 discipline); assignment is a
  * map-only pass finished by a partial-aggregable struct-min argmin;
  * the pair search is an equi-join keyed on cell. The registered
  * oracle pins label-SEEDED cells, whose count is FIXED — so within-
  * cell pair volume grows quadratically with the corpus. At open scale
  * a deployment sets [[ScaleCaps.maxCellSize]] (env
  * `SPARK_GRAFT_MAX_CELL_SIZE`) and cells above the bound are
  * hash-split into ceil(n/bound) sub-cells before the pair join — the
  * paper's own k-grows-with-corpus recipe (~10⁵ cells at web scale)
  * applied below the fixed cell layer, making pair volume linear
  * (~n·bound/2 per cell; CAND_GROWTH.json carries the measured
  * counts). Unset ⇒ bit-equal to the lossless within-cell join the
  * oracle gates (no size aggregate, no sub column in the plan). The
  * keep rule windows ONLY the clustered subset (cc_label hits —
  * bounded by dup volume); singletons union back untouched with
  * keep=true, so the full corpus is never exchanged or sorted for the
  * verdict. No all-pairs anywhere (ops/Dedup.scala:20 contract).
  *
  * Reference scope: no semantic dedup in the reference; engine
  * extension (SURVEY §2.5, the X2/X18/X20 dedup-decision family).
  */
object SemDedup {

  /** Within-cell near-duplicate threshold (X20's corpus-calibrated τ). */
  val Tau = 0.35

  def semDedup(spark: SparkSession, dir: String): DataFrame =
    semOf(Tables.embeddings(spark, dir), ScaleCaps.maxCellSize)

  /** The nearest-cell assignment carrying the cosine pieces: X70's
    * E-step with the embedding threaded through the argmin ((dist_q,
    * c_label) is total — the X71 trick). */
  private[graft] def bestOf(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val cent = Assign.centroidArrays(e)
      .withColumn("nq_c", dotQ($"c", $"c"))
    // explicit not-null (vec_id is a key): the clustered branch's inner
    // join infers isnotnull(vec_id) into ITS scan while the anti branch
    // doesn't — without this filter the two best subtrees canonicalize
    // differently and the corpus-side exchange is computed twice
    // instead of once via ReusedExchange
    e.filter($"vec_id".isNotNull).crossJoin(broadcast(cent))
      .select($"vec_id", $"c_label", $"embedding",
        dotQ($"embedding", $"embedding").as("nq"),
        dotQ($"embedding", $"c").as("dvc"), $"nq_c",
        (dotQ($"embedding", $"embedding")
          - lit(2.0) * dotQ($"embedding", $"c")
          + dotQ($"c", $"c")).as("dist_q"))
      .groupBy($"vec_id")
      .agg(min(struct($"dist_q", $"c_label", $"embedding",
        $"nq", $"dvc", $"nq_c")).as("b"))
      .select($"vec_id", $"b.c_label".as("cell"),
        $"b.embedding".as("e"), $"b.nq".as("nq"),
        cosQ($"b.dvc", $"b.nq", $"b.nq_c").as("cos_cent"))
  }

  /** The within-cell candidate pair stream, pre-threshold — the frame
    * whose cardinality IS x145's scale cost (CandGrowth counts it).
    * Lossless (`maxCell == Long.MaxValue`): the plain cell equi-join,
    * byte-identical to the oracle-gated form. Capped: cells above
    * `maxCell` are hash-split into ceil(n/bound) sub-cells and pairs
    * are found within sub-cells only — pair volume turns linear in the
    * corpus at declared recall (a dup pair is missed only when the
    * split separates it; the x62/x63 cap philosophy one layer down).
    */
  private[graft] def candidatePairsOf(best: DataFrame,
      maxCell: Long): DataFrame = {
    val spark = best.sparkSession
    import spark.implicits._
    if (maxCell == Long.MaxValue) {
      best.as("x").join(best.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") < col("y.vec_id"))
    } else {
      // |cells| rows — broadcast back so sub-cell assignment is map-only
      val sizes = best.groupBy($"cell").agg(count(lit(1)).as("n_cell"))
      val sub = best.join(broadcast(sizes), Seq("cell"))
        .withColumn("sub", pmod(md5Long40($"vec_id".cast("string")),
          greatest(ceil($"n_cell".cast("double") / maxCell.toDouble)
            .cast("long"), lit(1L))))
        .drop("n_cell")
      sub.as("x").join(sub.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.sub") === col("y.sub") &&
          col("x.vec_id") < col("y.vec_id"))
    }
  }

  /** Core of X145 over any (vec_id, label, embedding) frame. */
  private[graft] def semOf(e: DataFrame,
      maxCell: Long = Long.MaxValue): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // Materialize the assignment ONCE: `best` feeds three consumers —
    // the within-cell pair join (twice, as both self-join sides), the
    // clustered-subset join, and the singleton anti-join — and the
    // AQE-final plan showed the whole centroid + crossJoin + argmin
    // subtree executing once PER CONSUMER (self-join sides and the
    // anti branch cannot share exchanges). One eager checkpoint of the
    // corpus-sized assignment replaces three full corpus passes
    // (guide §2.4: remove repeated computation outright).
    val best = bestOf(e).localCheckpoint()
    val pairs = candidatePairsOf(best, maxCell)
      .filter(cosQ(dotQ(col("x.e"), col("y.e")),
        col("x.nq"), col("y.nq")) >= Tau)
      .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
      .select($"doc", $"label".as("cc_label"))
    val byCluster = Window.partitionBy($"cluster_id")
    // keep verdict: window ONLY the clustered subset (bounded by dup
    // volume); singletons never enter an exchange or sort — they are
    // their own keeper by definition
    val clustered = best.join(labels, $"vec_id" === $"doc")
      .select($"vec_id", $"cell", $"cos_cent",
        $"cc_label".as("cluster_id"))
      .withColumn("cluster_size", count(lit(1)).over(byCluster))
      .withColumn("keeper",
        min(struct($"cos_cent", $"vec_id")).over(byCluster))
      .select($"vec_id", $"cell", $"cluster_id", $"cluster_size",
        ($"keeper.vec_id" === $"vec_id").as("keep"))
    val singletons = best.join(labels, $"vec_id" === $"doc", "left_anti")
      .select($"vec_id", $"cell", $"vec_id".as("cluster_id"),
        lit(1L).as("cluster_size"), lit(true).as("keep"))
    clustered.unionByName(singletons).orderBy($"vec_id")
  }

  val semDedupSql: String = {
    val dxy = sqlDotQ("xe", "ye")
    // Shared-CTE discipline (the x178 lesson, BASELINE/verify notes):
    // DuckDB may re-execute an unmaterialized CTE once per reference.
    // `pairs` is read by BOTH arms of `edges`' UNION — without
    // MATERIALIZED the entire within-cell pair join (the quadratic
    // core, ~180M candidate pairs at 30×) runs twice — and `best`
    // feeds precand (twice), clustered, and the final SELECT. The
    // hints change evaluation strategy only, never results.
    // The deciding test is the quantized cosine ≥ Tau, unchanged. The
    // `precand` stage is a PURELY conservative native prefilter so the
    // interpreted per-term dotQ lambda runs on near-threshold pairs
    // only (at 10× the within-cell pair stream is ~20M rows — the
    // lambda on all of them is an hour-class DuckDB run; the native
    // list_dot_product is vectorized C++): with unit-norm embeddings
    // (corpus fact) the quantized cosine differs from the native one by
    // ≤ ~d/1e15·(1/‖x‖‖y‖) ≈ 1e-13 (per-term floor error ≤ 1 on a
    // 1e15 scale, d = 64 terms, norms quantized the same way), so a
    // native cut at Tau − 1e-6 can never drop a pair the quantized
    // test would keep.
    s"""WITH RECURSIVE ${Assign.centCtes},
       |centn AS (
       |  SELECT c_label, c, ${sqlDotQ("c", "c")} AS nq_c FROM cent),
       |bestd AS (
       |  SELECT vec_id, embedding,
       |         ${sqlDotQ("embedding", "embedding")} AS nq, c_label
       |  FROM rk WHERE rk = 1),
       |best AS MATERIALIZED (
       |  SELECT b.vec_id, b.c_label AS cell, b.embedding AS e, b.nq,
       |         list_dot_product(b.embedding, b.embedding) AS nd,
       |         ${sqlCosQ(sqlDotQ("b.embedding", "cn.c"), "b.nq", "cn.nq_c")}
       |           AS cos_cent
       |  FROM bestd b JOIN centn cn ON b.c_label = cn.c_label),
       |precand AS (
       |  SELECT x.vec_id AS doc_a, y.vec_id AS doc_b,
       |         x.e AS xe, y.e AS ye, x.nq AS xnq, y.nq AS ynq
       |  FROM best x JOIN best y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE list_dot_product(x.e, y.e) / (sqrt(x.nd) * sqrt(y.nd))
       |          >= $Tau - 1e-6),
       |pairs AS MATERIALIZED (
       |  SELECT doc_a, doc_b FROM precand
       |  WHERE ${sqlCosQ(dxy, "xnq", "ynq")} >= $Tau),
       |edges AS MATERIALIZED (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e2.b FROM reach r JOIN edges e2 ON r.b = e2.a),
       |comp AS (
       |  SELECT a AS doc, least(a, min(b)) AS cluster_id
       |  FROM reach GROUP BY a),
       |clustered AS (
       |  SELECT best.vec_id, best.cell, best.cos_cent,
       |         coalesce(comp.cluster_id, best.vec_id) AS cluster_id
       |  FROM best LEFT JOIN comp ON best.vec_id = comp.doc)
       |SELECT vec_id, cell, cluster_id,
       |       count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
       |       (row_number() OVER (PARTITION BY cluster_id
       |          ORDER BY cos_cent ASC, vec_id ASC) = 1) AS keep
       |FROM clustered
       |ORDER BY vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x145_semdedup" -> semDedup _)

  val oracles: Map[String, String] = Map(
    "x145_semdedup" -> semDedupSql)
}
