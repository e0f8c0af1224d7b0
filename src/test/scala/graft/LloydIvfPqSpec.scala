package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing.{cosQ, dotQ}
import graft.ops.{LloydIvf, LloydIvfPq, LloydPq}

/** X178 — IVF-PQ over residuals (IVFADC): the composed index probes
  * exactly on a separated fixture (all candidates admitted → the probe
  * IS brute force over the probed cells), the stored codes are the
  * argmin fixpoint of the final residual codebooks, recall clears the
  * coarse-pruning floor on the real corpus, and the registered query
  * equals the seam identity.
  */
class LloydIvfPqSpec extends SparkSpec {

  import spark.implicits._

  test("X178: PQ training needs at least one round") {
    val e = Seq((0L, 0, Array.fill(64)(0.1f)))
      .toDF("vec_id", "label", "embedding")
    intercept[IllegalArgumentException] {
      LloydIvfPq.buildIvfPqIndexOf(e, 1, 0)
    }
  }

  test("X178: separated blobs — coarse cells hold, and the probe equals " +
    "brute force exactly when every candidate fits under CandK") {
    // two blobs of 20 vectors, ±0.5 in the first half of the dims, with
    // per-(vector, dim) deterministic jitter so the residuals are
    // non-degenerate in every subspace; labels seed the truth (the
    // mis-seeding-heals claim is x166's — here the fixture isolates the
    // RESIDUAL layer). 38 non-self candidates per query < CandK = 48,
    // so the ADC cut admits everything and the exact rerank makes the
    // probe identical to brute force over the probed (= all) cells.
    val vecs = (0 until 40).map { i =>
      val blob = i / 20
      val base = if (blob == 0) 0.5f else -0.5f
      val a = Array.tabulate(64) { d =>
        val jitter = ((i * 13 + d * 7) % 11 - 5) * 0.01f
        if (d < 32) base + jitter else jitter
      }
      (i.toLong, blob, a)
    }.toDF("vec_id", "label", "embedding")
    val idx = LloydIvfPq.buildIvfPqIndexOf(vecs, LloydIvfPq.T, LloydIvfPq.T)
    val cells = idx.encoded.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 until 20).map(i => cells(i.toLong)).distinct.length == 1)
    assert((20 until 40).map(i => cells(i.toLong)).distinct.length == 1)
    assert(cells(0L) != cells(20L),
      "label-seeded separated blobs must stay in distinct coarse cells")

    val e = vecs.select($"vec_id", $"embedding",
      dotQ($"embedding", $"embedding").as("nq"))
    val q = e.filter($"vec_id" < LloydIvfPq.NQueries)
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
    val got = LloydIvfPq.probe(idx).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(got == brute,
      "with every candidate admitted the IVFADC probe must equal brute " +
        "force exactly — the approximation layers add no error here")
  }

  test("X178: stored codes are the per-subspace argmin fixpoint of the " +
    "final codebooks against independently re-derived residuals") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    // recompute each vector's quantized residual slices from scratch
    // (floor(v*1e6) - floor(c*1e6), sliced) and check the stored code
    // is the E-step argmin against the final codebooks
    val rsl = idx.encoded
      .join(broadcast(idx.centroids), $"cell" === $"c_cell")
      .withColumn("qd", zip_with($"embedding", $"c", (x, y) =>
        floor(x.cast("double") * 1000000.0).cast("long")
          - floor(y.cast("double") * 1000000.0).cast("long")))
      .select($"vec_id", $"codes", posexplode(expr(
        s"transform(sequence(0, ${LloydIvfPq.M - 1}), j -> " +
          s"slice(qd, j * ${LloydIvfPq.Sub} + 1, ${LloydIvfPq.Sub}))"))
        .as(Seq("sub", "qs")))
      .select($"vec_id", $"codes", $"sub".cast("long").as("sub"), $"qs")
    val re = rsl.join(broadcast(idx.codebooks), Seq("sub"))
      .withColumn("dist", expr(
        "aggregate(zip_with(qs, qc, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, t) -> acc + t)"))
      .groupBy($"vec_id", $"codes", $"sub")
      .agg(min(struct($"dist", $"c_code")).as("best"))
      .filter(element_at($"codes", ($"sub" + 1).cast("int"))
        =!= $"best.c_code")
    assert(re.count() == 0L,
      "every stored code must be the argmin against the final residual " +
        "codebooks on the re-derived residual grid")
  }

  test("X178: probe recall clears the coarse-pruning floor vs " +
    "brute-force cosine top-5 on the real corpus") {
    val e = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding",
        dotQ($"embedding", $"embedding").as("nq"))
    val q = e.filter($"vec_id" < LloydIvfPq.NQueries)
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
    val got = LloydIvfPq.probe(LloydIvfPq.ivfPqIndex(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    assert(recall >= 0.2,
      s"IVFADC recall@5 fell to $recall — x166's coarse pruning bound " +
        s"(nprobe=${LloydIvfPq.NProbe}) is the binding constraint, and " +
        "the ADC layer must not cost below its floor")
  }

  test("X178: the ADC layer loses no recall against the IVF probe's own " +
    "exact scan at the same nprobe") {
    // the PQ approximation only reorders WITHIN the probed cells; with
    // CandK = 48 of ~100 probed candidates it must keep the true top-5
    // of the probed set (x166's result at the same nprobe) intact here
    val ivfGot = LloydIvf.probe(LloydIvf.lloydIndex(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val got = LloydIvfPq.probe(LloydIvfPq.ivfPqIndex(spark, sfDir))
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val kept = (got & ivfGot).size.toDouble / ivfGot.size
    assert(kept >= 0.8,
      s"IVFADC kept only $kept of the exact-scan IVF top-5 at the same " +
        "nprobe — the ADC cut is dropping true neighbors")
  }

  test("X181: the adaptive candK dial is exactly " +
    "max(CandK, pop div 6) per query, and its admitted set contains " +
    "the fixed-dial set") {
    val idx = LloydIvfPq.ivfPqIndex(spark, sfDir)
    // pop per query = the whole ADC-scanned population (huge candK)
    val pop = LloydIvfPq.candidates(idx, LloydIvfPq.NProbe, Int.MaxValue)
      .groupBy($"query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adaptive = LloydIvfPq
      .candidatesAdaptive(idx, LloydIvfPq.NProbe, LloydIvfPq.CandK)
    val perQ = adaptive.groupBy($"query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    pop.foreach { case (qid, p) =>
      val want = math.min(p,
        math.max(LloydIvfPq.CandK.toLong, p / LloydIvfPq.AdaptiveDiv))
      assert(perQ.getOrElse(qid, 0L) == want,
        s"query $qid: adaptive admitted ${perQ.getOrElse(qid, 0L)} of " +
          s"pop $p, want $want")
    }
    val fixedPairs = LloydIvfPq
      .candidates(idx, LloydIvfPq.NProbe, LloydIvfPq.CandK)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val adPairs = adaptive.select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fixedPairs.subsetOf(adPairs),
      "candK only grows under the adaptive dial — the admitted set " +
        "must contain the fixed-dial set")
    // registered identity + shape
    val reg = SparkEntry.queries("x181_ivfpq_adaptive_topk")(spark, sfDir)
    val seam = LloydIvfPq.probeAdaptive(idx)
    assert(reg.columns.toSeq == Seq("query_id", "rnk", "vec_id", "cos_sim"))
    assert(reg.collect().map(_.toString).toSeq ==
      seam.collect().map(_.toString).toSeq)
  }

  test("X178: registered query equals the seam identity and is shaped") {
    val reg = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
    val seam = LloydIvfPq.probe(LloydIvfPq.ivfPqIndex(spark, sfDir))
    assert(reg.columns.toSeq ==
      Seq("query_id", "rnk", "vec_id", "cos_sim"))
    assert(reg.collect().map(_.toString).toSeq ==
      seam.collect().map(_.toString).toSeq)
    val rows = reg.collect()
    assert(rows.length == 5 * LloydIvfPq.NQueries,
      "top-5 per query for each of the fixed query band")
    assert(rows.forall(r => r.getAs[Long]("vec_id")
      != r.getAs[Long]("query_id")), "self-matches are excluded")
    assert(LloydIvfPq.K == LloydPq.K && LloydIvfPq.CandK == LloydPq.CandK,
      "the composed index runs at the family's registered dials")
  }
}
