package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing.{cosQ, dotQ}
import graft.ops.LloydPq

/** X173 — integer-exact Lloyd-trained product quantization: per-subspace
  * training converges on a separable fixture, the trained encoding is
  * the argmin fixpoint of the final codebooks, the ADC probe's recall
  * clears a floor against brute-force cosine top-5, and the registered
  * query equals the seam identity.
  */
class LloydPqSpec extends SparkSpec {

  import spark.implicits._

  test("X173: training needs at least one round") {
    val e = Seq((0L, Array(0.1f))).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      LloydPq.buildPqLloydIndexOf(e, 0)
    }
  }

  test("X173: per-subspace blobs separate whatever the seed scatter") {
    // 64-dim vectors in two blobs that differ ONLY inside subspace 0
    // (dims 0-7, split by vector half) and two blobs that differ only
    // inside subspace 3 (dims 24-31, split by parity) — the independent
    // per-subspace fits must separate each pair inside its own subspace
    // while the (vec_id + sub) % K seed scatters members across all 16
    // codes initially. (The splits are chosen so the SEED means already
    // differ across codes — a split whose classes hit every code in the
    // same ratio makes all 16 seed centroids identical and the problem
    // degenerate, the LloydIvfSpec half/half caveat.)
    val vecs = (0 until 48).map { i =>
      val a = Array.fill(64)(0.0f)
      if (i < 24) a(1) = 0.4f else a(1) = -0.4f
      if (i % 2 == 0) a(26) = 0.3f else a(26) = -0.3f
      (i.toLong, a)
    }.toDF("vec_id", "embedding")
    val idx = LloydPq.buildPqLloydIndexOf(vecs, LloydPq.T)
    val codes = idx.encoded.select($"vec_id", $"codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def codeOf(i: Int, sub: Int) = codes(i.toLong)(sub)
    val lo0 = (0 until 24).map(codeOf(_, 0)).distinct
    val hi0 = (24 until 48).map(codeOf(_, 0)).distinct
    assert(lo0.length == 1 && hi0.length == 1 && lo0 != hi0,
      "subspace 0 must split the ±0.4 half-blobs into two codes")
    val even3 = (0 until 48 by 2).map(codeOf(_, 3)).distinct
    val odd3 = (1 until 48 by 2).map(codeOf(_, 3)).distinct
    assert(even3.length == 1 && odd3.length == 1 && even3 != odd3,
      "subspace 3 must split the ±0.3 parity blobs independently")
  }

  test("X173: the trained encoding is the per-subspace argmin fixpoint " +
    "of the final codebooks") {
    val idx = LloydPq.pqLloydIndex(spark, sfDir)
    // re-derive each vector's nearest code per subspace from the final
    // codebooks independently (the E-step definition) and compare with
    // the stored codes array
    val qs = idx.encoded.select($"vec_id", $"codes",
      posexplode(expr(
        s"transform(sequence(0, ${LloydPq.M - 1}), j -> " +
          s"transform(slice(embedding, j * ${LloydPq.Sub} + 1, " +
          s"${LloydPq.Sub}), " +
          "x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT)))"))
        .as(Seq("sub", "qsl")))
      .select($"vec_id", $"codes", $"sub".cast("long").as("sub"), $"qsl")
    val re = qs.join(broadcast(idx.codebooks), Seq("sub"))
      .withColumn("dist", expr(
        "aggregate(zip_with(qsl, qc, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, t) -> acc + t)"))
      .groupBy($"vec_id", $"codes", $"sub")
      .agg(min(struct($"dist", $"c_code")).as("best"))
      .filter(element_at($"codes", ($"sub" + 1).cast("int"))
        =!= $"best.c_code")
    assert(re.count() == 0L,
      "every stored code must be the argmin against the final codebooks")
  }

  test("X173: ADC probe recall clears the floor vs brute-force cosine " +
    "top-5") {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding",
        dotQ($"embedding", $"embedding").as("nq"))
    val q = e.filter($"vec_id" < LloydPq.NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        $"nq".as("qnq"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"c".desc, $"vec_id".asc)
    val brute = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosQ(dotQ($"embedding", $"qe"), $"nq", $"qnq").as("c"))
      .withColumn("rnk", row_number().over(byQ)).filter($"rnk" <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = LloydPq.probe(LloydPq.pqLloydIndex(spark, sfDir)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.4,
      s"ADC at CandK=${LloydPq.CandK} must keep recall@5 >= 0.4 on the " +
        s"near-uniform corpus (got $recall; the MLlib-codebook x31 sits " +
        "in the same band — see ANN_SWEEP.md)")
  }

  test("X173: registered query equals the seam identity and is shaped") {
    val reg = SparkEntry.queries("x173_pq_lloyd_topk")(spark, sfDir)
    val seam = LloydPq.probe(LloydPq.pqLloydIndex(spark, sfDir))
    assert(reg.columns.toSeq ==
      Seq("query_id", "rnk", "vec_id", "cos_sim"))
    assert(reg.collect().map(_.toString).toSeq ==
      seam.collect().map(_.toString).toSeq)
    val rows = reg.collect()
    assert(rows.length == 5 * LloydPq.NQueries,
      "top-5 per query for each of the fixed query band")
    assert(rows.forall(r => r.getAs[Long]("vec_id")
      != r.getAs[Long]("query_id")), "self-matches are excluded")
  }
}
