package graft

import graft.ops.{LloydIvfPq, Text, Vector => VecOps}

/** Sanity/invariant tests for the text and vector operators on the real
  * testdata (engine parity is the oracle's job; these pin semantics).
  */
class TextVectorSpec extends SparkSpec {

  test("X5: term frequencies cover every token exactly once") {
    val tf = Text.tokenTf(spark, sfDir).collect()
    assert(tf.nonEmpty)
    val totalOcc = tf.map(_.getAs[Long]("n_occurrences")).sum
    // token count independently derived from the quality query
    val totalTokens = Text.textQuality(spark, sfDir).collect()
      .map(_.getAs[Long]("n_tokens")).sum
    assert(totalOcc == totalTokens,
      s"TF total $totalOcc != tokenization total $totalTokens")
    // doc frequency can never exceed total docs
    val nDocs = Tables.documents(spark, sfDir).count()
    assert(tf.forall(_.getAs[Long]("n_docs") <= nDocs))
  }

  test("X6: corpus size counts documents, so idf is robust to docs with no tokens") {
    import org.apache.spark.sql.functions._
    // n_docs_total is counted from documents, not from the tokenized tf
    // relation — a doc tokenizing to zero words must still widen the
    // corpus. On this testdata the two coincide (no whitespace-only
    // docs), so pin the output against the direct document count and the
    // recomputed idf of one (doc, word) row.
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val out = Text.tfIdf(spark, sfDir).collect()
    assert(out.map(_.getAs[Long]("doc_id")).distinct.length <= nDocs)
    val r = out.head
    val expected = BigDecimal(
      r.getAs[Long]("tf") * math.log(nDocs.toDouble / r.getAs[Long]("df")))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(r.getAs[Double]("tfidf")) === expected,
      "tfidf must be computed against the documents-derived corpus size")
  }

  test("X10: CountInSet native expression is bit-equal to the filter-lambda form") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{countInSet, countInSetHof}
    val stop = Seq("the", "a")
    val words = split(trim(lower(col("text"))), "\\s+")
    val mismatches = Tables.documents(spark, sfDir)
      .select(words.as("w"))
      .select(countInSet(col("w"), stop).as("native"),
        countInSetHof(col("w"), stop).as("lambda"))
      .filter(col("native") =!= col("lambda"))
    assert(mismatches.isEmpty)
    // edge cases: null element skipped, empty array → 0, null array → null
    val edge = spark.range(1).select(
      countInSet(array(lit("the"), lit(null).cast("string"), lit("b")), stop).as("a"),
      countInSet(array().cast("array<string>"), stop).as("b"),
      countInSet(lit(null).cast("array<string>"), stop).as("c")).head()
    assert(edge.getInt(0) === 1 && edge.getInt(1) === 0 && edge.isNullAt(2))
  }

  test("X6: tf-idf is zero iff a term occurs in every document") {
    val rows = Text.tfIdf(spark, sfDir).collect()
    val nDocs = Tables.documents(spark, sfDir).count()
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val tfidf = r.getAs[Double]("tfidf")
      if (df == nDocs) assert(tfidf == 0.0, s"df=N must zero the score: $r")
      else assert(tfidf > 0.0, s"df<N must score positive: $r")
    }
  }

  test("X3: top-k starts at the query vector itself with cosine 1") {
    val top = VecOps.cosineTopK(spark, sfDir).collect()
    assert(top.length == 20)
    assert(top(0).getAs[Long]("vec_id") == 0L)
    assert(math.abs(top(0).getAs[Double]("cos_sim") - 1.0) < 1e-9)
    val sims = top.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b }, "not sorted desc")
    assert(sims.forall(s => s <= 1.0 + 1e-9 && s >= -1.0 - 1e-9))
  }

  test("X19: IVF-ANN is exact within the probed cell (the IVF contract)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Hashing.{cosQ, dotQ}
    val ivf = VecOps.annIvfTopK(spark, sfDir).collect()
    assert(ivf.nonEmpty)
    // per query: rank sequence well-formed, cosines sorted desc
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rnk"))
      assert(sorted.map(_.getAs[Int]("rnk")).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // exactness within the cell: for query 0 at nprobe=1, the ANN result
    // must equal the brute-force top-5 restricted to the query's own cell
    // (probing can miss cross-cell neighbors by design — random-ish
    // embeddings make global recall a coin flip, but in-cell exactness is
    // the contract)
    val index = VecOps.ivfIndex(spark, sfDir)
    val assigned = index.assigned
    val q0 = assigned.filter(col("vec_id") === 0)
      .select(col("embedding").as("qe"), col("cell").as("qcell"), col("nq").as("qnq"))
    val expected = assigned.join(q0,
      col("cell") === col("qcell") && col("vec_id") =!= 0)
      .select(col("vec_id"),
        cosQ(dotQ(col("embedding"), col("qe")), col("nq"), col("qnq")).as("c"))
      .orderBy(col("c").desc, col("vec_id").asc).limit(5)
      .collect().map(_.getLong(0)).toSeq
    val got = VecOps.ivfProbe(index, nprobe = 1).collect()
      .filter(_.getAs[Long]("query_id") == 0L)
      .sortBy(_.getAs[Int]("rnk")).map(_.getAs[Long]("vec_id")).toSeq
    assert(got == expected, s"in-cell top-5 mismatch: got $got expected $expected")
  }

  test("X19: nprobe sweep — recall vs brute force is monotone in probed cells") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{cosQ, dotQ}
    val index = VecOps.ivfIndex(spark, sfDir)
    // brute-force top-5 per query (the ANN ground truth)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dotQ(col("embedding"), col("embedding")).as("nq"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nq").as("qnq"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("c").desc, col("vec_id").asc)
    val brute = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosQ(dotQ(col("embedding"), col("qe")), col("nq"), col("qnq")).as("c"))
      .withColumn("rnk", row_number().over(byQ)).filter(col("rnk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cellSizes = index.assigned.groupBy(col("cell")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val sweep = Seq(1, 2, 4).map { np =>
      val got = VecOps.ivfProbe(index, np).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      val recall = (got & brute).size.toDouble / brute.size
      np -> recall
    }
    info(s"IVF sweep (recall@5 over 3 queries, 16 cells, cell sizes " +
      s"min=${cellSizes.values.min} max=${cellSizes.values.max}): " +
      sweep.map { case (np, r) => s"nprobe=$np -> ${"%.2f".format(r)}" }
        .mkString(", "))
    // probing more cells is a candidate superset → recall is monotone
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall regressed in sweep: $sweep")
    }
  }

  test("X31: PQ codes are valid and ADC recall vs brute force is high") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{cosQ, dotQ}
    val index = VecOps.pqIndex(spark, sfDir)
    // every vector carries M codes, each inside its codebook
    val codeCols = (0 until VecOps.PqM).map(j => s"code_$j")
    val bad = index.encoded.filter(
      codeCols.map(c => col(c) < 0 || col(c) >= VecOps.PqK).reduce(_ || _))
    assert(bad.count() == 0, "PQ code outside [0, K)")
    assert(index.codebooks.count() == VecOps.PqM.toLong * VecOps.PqK)
    // brute-force ground truth (same construction as the X19 sweep)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dotQ(col("embedding"), col("embedding")).as("nq"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nq").as("qnq"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("c").desc, col("vec_id").asc)
    val brute = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosQ(dotQ(col("embedding"), col("qe")), col("nq"), col("qnq")).as("c"))
      .withColumn("rnk", row_number().over(byQ)).filter(col("rnk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = VecOps.pqProbe(index).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val recall = (got & brute).size.toDouble / brute.size
    info(s"PQ ADC recall@5 over 3 queries (M=${VecOps.PqM}, K=${VecOps.PqK}, " +
      s"cand=${VecOps.PqCandK}): ${"%.2f".format(recall)}")
    assert(got.size == brute.size, "PQ probe returned a wrong-size top-5")
    assert(recall >= 0.6, s"ADC recall too low: $recall")
    // candK is a rank cutoff on one fixed ADC ordering → candidates are
    // nested → recall is monotone in candK (PQ's recall/cost contract)
    val sweep = Seq(16, VecOps.PqCandK, 128).map { ck =>
      val g = VecOps.pqProbe(index, ck).collect()
        .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
      ck -> (g & brute).size.toDouble / brute.size
    }
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 1e-9, s"PQ recall regressed in candK sweep: $sweep")
    }
  }

  test("X79: IVF-PQ candidates live inside the probed cells, rerank is " +
    "candK-bounded, and recall holds at the registered dials") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{cosQ, dotQ}
    val ivf = VecOps.ivfIndex(spark, sfDir)
    val pq = VecOps.pqIndex(spark, sfDir)
    // containment: the composed probe's candidates are a subset of the
    // plain-IVF candidate set at the same nprobe (ADC only prunes)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val np = VecOps.IvfPqNprobe
    val ivfSet = pairs(VecOps.ivfCandidates(ivf, np))
    val composed = pairs(VecOps.ivfPqCandidates(ivf, pq, np, VecOps.IvfPqCandK))
    assert(composed.subsetOf(ivfSet),
      "IVF-PQ candidates must come only from the probed cells")
    // per-query rerank bound
    val perQ = VecOps.ivfPqCandidates(ivf, pq, np, VecOps.IvfPqCandK)
      .groupBy(col("query_id")).count().collect().map(_.getLong(1))
    assert(perQ.forall(_ <= VecOps.IvfPqCandK),
      "rerank candidates must be candK-bounded per query")
    // recall vs the IN-CELL exact truth (what the composition can see at
    // this nprobe; cross-cell misses are IVF's, not the PQ stage's) —
    // ADC + candK=48 over ≤ nprobe/16 of a 500-vector corpus must keep
    // most of the reachable top-5
    val reachable = VecOps.rerankTop5(VecOps.ivfCandidates(ivf, np))
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairs(VecOps.ivfPqProbe(ivf, pq, np, VecOps.IvfPqCandK))
    val recall = (got & reachable).size.toDouble / reachable.size
    info(s"IVF-PQ in-cell recall@5 (nprobe=$np, candK=${VecOps.IvfPqCandK}): " +
      "%.2f".format(recall))
    assert(recall >= 0.6, s"in-cell ADC recall too low: $recall")
    // candK sweep is monotone (nested short-lists, fixed ADC order)
    val sweep = Seq(8, 48, 200).map { ck =>
      val g = pairs(VecOps.ivfPqProbe(ivf, pq, np, ck))
      ck -> (g & reachable).size.toDouble / reachable.size
    }
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 1e-9, s"IVF-PQ recall regressed in candK sweep: $sweep")
    }
  }

  test("X79-sym: reverse-probe symmetrization admits a superset pool, " +
    "stays candK-bounded, and never loses recall at the registered dial") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{cosQ, dotQ}
    val ivf = VecOps.ivfIndex(spark, sfDir)
    val pq = VecOps.pqIndex(spark, sfDir)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val np = VecOps.IvfPqNprobe
    // pool containment: with the candK cut disabled (huge candK) the sym
    // pair pool contains every forward pair — reverse edges only ADD
    val big = 1000000
    val fwdPool = pairs(VecOps.ivfPqCandidates(ivf, pq, np, big))
    val symPool = pairs(VecOps.ivfPqCandidatesSym(ivf, pq, np, big))
    assert(fwdPool.subsetOf(symPool),
      "sym pool must contain every forward-probed pair")
    // per-query rerank bound survives the union
    val perQ = VecOps.ivfPqCandidatesSym(ivf, pq, np, VecOps.IvfPqCandK)
      .groupBy(col("query_id")).count().collect().map(_.getLong(1))
    assert(perQ.forall(_ <= VecOps.IvfPqCandK),
      "sym rerank candidates must be candK-bounded per query")
    // recall vs full brute-force truth: sym never loses to plain at the
    // registered dial (measured ANN_SWEEP invariant, pinned here on the
    // deterministic spec corpus)
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dotQ(col("embedding"), col("embedding")).as("nq"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nq").as("qnq"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("c").desc, col("vec_id").asc)
    val brute = pairs(e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosQ(dotQ(col("embedding"), col("qe")), col("nq"), col("qnq"))
          .as("c"))
      .withColumn("rnk", row_number().over(byQ))
      .filter(col("rnk") <= 5))
    val plainR = (pairs(VecOps.ivfPqProbe(ivf, pq, np, VecOps.IvfPqCandK))
      & brute).size.toDouble / brute.size
    val symR = (pairs(VecOps.ivfPqProbeSym(ivf, pq, np, VecOps.IvfPqCandK))
      & brute).size.toDouble / brute.size
    info(f"IVF-PQ recall@5 at nprobe=$np: plain $plainR%.2f, sym $symR%.2f")
    assert(symR >= plainR - 1e-9,
      s"sym recall ($symR) lost to plain ($plainR) at the registered dial")
    // the sym form is REGISTERED as x151 at exactly this dial —
    // round-16 re-pointed it at the integer-exact IVFADC index (so it
    // carries an oracle); the gated query must be THAT sym probe,
    // verbatim, and the sym-pool superset/never-worse contracts must
    // hold on the exact index too
    val exact = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val exactPlain = pairs(LloydIvfPq.probe(exact, np, VecOps.IvfPqCandK))
    val exactSym = pairs(LloydIvfPq.probeSym(exact, np, VecOps.IvfPqCandK))
    val exactPlainR = (exactPlain & brute).size.toDouble / brute.size
    val exactSymR = (exactSym & brute).size.toDouble / brute.size
    info(f"exact-index IVFADC recall@5 at nprobe=$np: " +
      f"plain $exactPlainR%.2f, sym $exactSymR%.2f")
    assert(exactSymR >= exactPlainR - 1e-9,
      s"exact-index sym recall ($exactSymR) lost to plain ($exactPlainR)")
    val reg = SparkEntry.queries("x151_ann_ivfpq_sym_topk")(spark, sfDir)
    assert(pairs(reg) == exactSym,
      "registered x151 must be the exact-index sym probe at the registered dial")
  }

  test("X21: multi-probe candidates strictly contain the single-bucket " +
    "set and recall is monotone in probes") {
    import org.apache.spark.sql.functions._
    import graft.functions.Hashing.{cosQ, dotQ}
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val c1 = pairs(VecOps.lshCandidates(spark, sfDir, 1))
    val c2 = pairs(VecOps.lshCandidates(spark, sfDir, 2))
    val c4 = pairs(VecOps.lshCandidates(spark, sfDir, 4))
    assert(c1.subsetOf(c2) && c2.subsetOf(c4),
      "each extra probe must only ADD candidates")
    // consistency with the registered queries: probes=1 reranks to x14's
    // result, probes=2 to x21's
    def top5(df: org.apache.spark.sql.DataFrame) = df
      .select("query_id", "rnk", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(top5(VecOps.rerankTop5(VecOps.lshCandidates(spark, sfDir, 1)))
      == top5(VecOps.annLshTopK(spark, sfDir)),
      "lshCandidates(1) must rerank to exactly x14's top-5")
    assert(top5(VecOps.rerankTop5(VecOps.lshCandidates(spark, sfDir, 2)))
      == top5(VecOps.annMultiProbe(spark, sfDir)),
      "lshCandidates(2) must rerank to exactly x21's top-5")
    // brute-force ground truth → recall floor and monotonicity
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"),
        dotQ(col("embedding"), col("embedding")).as("nq"))
    val q = e.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("nq").as("qnq"))
    val byQ = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("c").desc, col("vec_id").asc)
    val brute = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        cosQ(dotQ(col("embedding"), col("qe")), col("nq"), col("qnq")).as("c"))
      .withColumn("rnk", row_number().over(byQ)).filter(col("rnk") <= 5)
      .select("query_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sweep = Seq(1 -> c1, 2 -> c2, 4 -> c4).map { case (np, c) =>
      val got = top5(VecOps.rerankTop5(
        VecOps.lshCandidates(spark, sfDir, np))).map(t => (t._1, t._3))
      np -> (got & brute).size.toDouble / brute.size
    }
    info("LSH multi-probe sweep: " + sweep.map { case (np, r) =>
      s"probes=$np -> ${"%.2f".format(r)}" }.mkString(", "))
    sweep.sliding(2).foreach { case Seq((_, r1), (_, r2)) =>
      assert(r2 >= r1 - 1e-9, s"recall regressed in probe sweep: $sweep")
    }
  }

  test("X4: pairwise join respects the block and the threshold") {
    val pairs = VecOps.pairwiseSimilarity(spark, sfDir).collect()
    pairs.foreach { p =>
      assert(p.getAs[Long]("vec_a") < p.getAs[Long]("vec_b"), "unordered pair")
      assert(p.getAs[Double]("cos_sim") >= 0.35, "below threshold")
    }
    // block discipline: every returned pair shares its label by construction
    // (the join key); verify against the base table for a sample
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    pairs.take(20).foreach { p =>
      assert(labels(p.getAs[Long]("vec_a")) == labels(p.getAs[Long]("vec_b")))
    }
  }

  test("X51: hard negatives are cross-label and truly the hardest") {
    val rows = VecOps.hardNegatives(spark, sfDir).collect()
    val labels = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { r =>
      assert(labels(r.getAs[Long]("q_id")) != labels(r.getAs[Long]("neg_id")),
        "a negative must carry a different label")
      assert(r.getAs[Double]("cos_sim") <= 1.0 + 1e-9)
    }
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rs.length.toLong), s"query $q: ranks must be dense")
      val sims = rs.sortBy(_.getAs[Long]("rk")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sortBy(-_)), s"query $q: rank order")
    }
    // spot-check query 0: its top negative beats every same-rank-excluded
    // cross-label candidate (recompute driver-side from raw vectors)
    import spark.implicits._
    val vecs = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(_.toDouble)))
    val (qid, qlab, qv) = vecs.find(_._1 == 0L).get
    def dotQd(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => math.floor(x * y * 1e15).toLong }.sum.toDouble
    val best = vecs.filter(_._2 != qlab)
      .map { case (id, _, v) =>
        id -> dotQd(qv, v) / (math.sqrt(dotQd(v, v)) * math.sqrt(dotQd(qv, qv)))
      }.maxBy { case (id, c) => (c, -id) }
    val got = rows.filter(r => r.getAs[Long]("q_id") == 0L &&
      r.getAs[Long]("rk") == 1L).head
    assert(got.getAs[Long]("neg_id") == best._1,
      s"query 0 top negative ${got.getAs[Long]("neg_id")} != brute ${best._1}")
  }
}
