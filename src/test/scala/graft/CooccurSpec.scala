package graft

import graft.ops.Cooccur

/** X44 — co-occurrence PMI: pair-window semantics on a hand corpus,
  * exact-count invariants on the real corpus, and the no-self-join
  * plan property of the row-local pair generation.
  */
class CooccurSpec extends SparkSpec {

  test("X44: pair window, canonical order, and PMI on a known corpus") {
    import spark.implicits._
    // "a b c a" with window 2: (a,b) (a,c) (b,c) (a,b)←(b,a) (a,c)←(c,a)
    val docs = Seq((1L, "a b c a")).toDF("doc_id", "text")
    val rows = Cooccur.cooccurOf(docs, windowW = 2, minPair = 1).collect()
    val got = rows.map(r => (r.getAs[String]("w1"), r.getAs[String]("w2")) ->
      ((r.getAs[Long]("c_xy"), r.getAs[Long]("c_x"), r.getAs[Long]("c_y"),
        r.getAs[Double]("pmi_q")))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    val (cab, ca, cb, pmiAb) = got(("a", "b"))
    assert((cab, ca, cb) == ((2L, 2L, 1L)))
    assert(got(("a", "c"))._1 == 2L && got(("b", "c"))._1 == 1L)
    // N = 4 tokens, P = 5 pairs; pmi(a,b) = ln(2·16 / (5·2·1))
    val expect = BigDecimal(math.log(2.0 * 4 * 4 / (5.0 * 2 * 1)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(pmiAb == expect, s"pmi was $pmiAb, want $expect")
  }

  test("X44: counts are internally consistent on the corpus") {
    val rows = Cooccur.cooccurPmi(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w1, w2) = (r.getAs[String]("w1"), r.getAs[String]("w2"))
      assert(w1 <= w2, "pairs must be canonicalized")
      assert(r.getAs[Long]("c_xy") >= Cooccur.MinPair)
      // a pair can't co-occur more often than its rarer member appears
      assert(r.getAs[Long]("c_xy") <=
        math.min(r.getAs[Long]("c_x"), r.getAs[Long]("c_y")) * Cooccur.WindowW)
    }
  }

  test("X44/X49: native skip-gram pairs equal the lambda reference form") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{split, trim, lower}
    import graft.functions.Hashing
    val words = Tables.documents(spark, sfDir)
      .select(split(trim(lower($"text")), "\\s+").as("w"))
    for (canonical <- Seq(true, false); window <- Seq(1, 2, 3)) {
      val native = words.select(
        Hashing.skipGramPairs($"w", window, canonical).as("p")).collect()
      val hof = words.select(
        Hashing.skipGramPairsHof($"w", window, canonical).as("p")).collect()
      native.zip(hof).foreach { case (n, h) =>
        assert(n.getSeq[String](0) == h.getSeq[String](0),
          s"mismatch at canonical=$canonical window=$window")
      }
    }
    // edge cases the corpus may not cover: empty, 1-token, dup tokens
    val edge = Seq(Seq.empty[String], Seq("a"), Seq("b", "a", "b"))
      .toDF("w")
    for (canonical <- Seq(true, false)) {
      val n = edge.select(Hashing.skipGramPairs($"w", 2, canonical).as("p"))
        .collect().map(_.getSeq[String](0))
      val h = edge.select(Hashing.skipGramPairsHof($"w", 2, canonical).as("p"))
        .collect().map(_.getSeq[String](0))
      assert(n.toSeq == h.toSeq, s"edge mismatch at canonical=$canonical")
    }
  }

  test("X44: pair generation is row-local — no token self-join") {
    val df = Cooccur.cooccurPmi(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the only joins are the vocab lookups + the one-row totals
    // broadcast; a SortMergeJoin would mean the pair build regressed to
    // the positional self-join of the token stream
    assert(!plan.contains("SortMergeJoin"),
      s"pair generation must not shuffle-join the token stream:\n$plan")
  }
}
