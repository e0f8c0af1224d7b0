package graft

import org.apache.spark.sql.functions._

import graft.ops.{Containment, PrefixJoin}

/** Validates ScaleBench's capped-recall GROUND TRUTH construction
  * set-exactly, at test scale (round-8 verdict item 3: the 30× capped
  * run reported wall only; the recall denominator it now reports is
  * `blocks × lossless(one block) + injected-cluster pairs`, which is
  * only exact if every claim below holds):
  *
  *  1. blocks are isomorphic and contribute NO cross-block qualifying
  *     pairs (disjoint vocabulary; the shared hot phrase's 5 shingles
  *     cannot reach J ≥ 1/2 or containment ≥ 3/4 against min-15-shingle
  *     documents) — so organic truth = blocks × W;
  *  2. the injected cluster (unique word + own 7-word phrase each)
  *     pairs with every other member and NOTHING organic — exactly
  *     C(K,2) Jaccard pairs / K·(K−1) ordered containments;
  *  3. the cap (≥ natural max df, < K) drops exactly the injected
  *     pairs: capped result == lossless minus the injected cluster,
  *     as SETS, not counts.
  */
class CapRecallSpec extends SparkSpec {

  private val K = 80
  private val cap = 60L
  private val injBase = 900000000L

  private def hotCorpus(blocks: Int) = {
    import spark.implicits._
    val base = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", $"lang", $"text")
    val organic = ScaleBench.replicate(base, blocks)
      .withColumn("text",
        concat($"text", lit(" the quick brown fox jumps over it")))
    organic.unionByName(
      spark.range(K).select(
        ($"id" + injBase).as("doc_id"),
        lit("injected").as("source"),
        lit("zz").as("lang"),
        concat(lit("uniq"), $"id",
          lit(" lorem ipsum dolor sit amet consectetur adipiscing"))
          .as("text")))
  }

  private def pairSet(df: org.apache.spark.sql.DataFrame,
      a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("X62 capped recall accounting: organic = blocks x one-block, " +
    "injected = C(K,2), capped = lossless minus injected (set-exact)") {
    val corpus2 = hotCorpus(2)
    val lossless = pairSet(PrefixJoin.prefixSimJoinOf(corpus2), "doc_a", "doc_b")
    val capped = pairSet(PrefixJoin.prefixSimJoinOf(corpus2, cap), "doc_a", "doc_b")

    def isInj(id: Long) = id >= injBase
    val injected = lossless.filter(p => isInj(p._1) && isInj(p._2))
    val mixed = lossless.filter(p => isInj(p._1) ^ isInj(p._2))
    assert(mixed.isEmpty, s"injected docs must pair with nothing organic: $mixed")
    assert(injected.size == K * (K - 1) / 2,
      s"injected cluster must contribute exactly C($K,2): ${injected.size}")

    def block(id: Long) = id / 10000000L
    val organic = lossless -- injected
    assert(organic.forall(p => block(p._1) == block(p._2)),
      "no organic cross-block pair may qualify")
    val perBlock = organic.groupBy(p => block(p._1)).view.mapValues(_.size).toMap
    assert(perBlock.getOrElse(0L, 0) == perBlock.getOrElse(1L, 0),
      s"blocks must be isomorphic: $perBlock")
    assert(organic.nonEmpty, "fixture must contain organic near-dup pairs")

    assert(capped == organic,
      "cap must drop exactly the injected hot-only pairs: " +
        s"extra=${capped -- organic} missing=${organic -- capped}")
  }

  test("X63 capped recall accounting: ordered containments — injected = " +
    "K*(K-1), capped = lossless minus injected (set-exact)") {
    val corpus2 = hotCorpus(2)
    val lossless = pairSet(Containment.containmentJoinOf(corpus2),
      "doc_inner", "doc_outer")
    val capped = pairSet(Containment.containmentJoinOf(corpus2, cap),
      "doc_inner", "doc_outer")

    def isInj(id: Long) = id >= injBase
    val injected = lossless.filter(p => isInj(p._1) && isInj(p._2))
    val mixed = lossless.filter(p => isInj(p._1) ^ isInj(p._2))
    assert(mixed.isEmpty, s"injected docs must contain/appear in nothing organic: $mixed")
    assert(injected.size == K * (K - 1),
      s"injected cluster must contribute exactly K*(K-1): ${injected.size}")

    def block(id: Long) = id / 10000000L
    val organic = lossless -- injected
    assert(organic.forall(p => block(p._1) == block(p._2)),
      "no organic cross-block containment may qualify")
    val perBlock = organic.groupBy(p => block(p._1)).view.mapValues(_.size).toMap
    assert(perBlock.getOrElse(0L, 0) == perBlock.getOrElse(1L, 0),
      s"blocks must be isomorphic: $perBlock")

    assert(capped == organic,
      "cap must drop exactly the injected hot-only containments: " +
        s"extra=${capped -- organic} missing=${organic -- capped}")
  }
}
