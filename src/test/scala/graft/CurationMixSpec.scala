package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusIndex, CurationMix, Mixing}

/** X153 — the curation composition: funnel conservation (every doc
  * lands in exactly one of gate_fail / low_quality / dup / kept),
  * consistency with the X22 ledger and the X46 weight law, a dirty
  * corpus exercising the gate column, and partition invariance.
  */
class CurationMixSpec extends SparkSpec {

  import spark.implicits._

  test("X153: funnel conserves the corpus and weights follow X46's law") {
    val out = CurationMix.curationMix(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_raw") ==
        r.getAs[Long]("n_gate_fail") + r.getAs[Long]("n_low_quality") +
          r.getAs[Long]("n_dup") + r.getAs[Long]("n_kept"),
        s"funnel leak for lang ${r.get(0)}")
      assert(r.getAs[Long]("n_gate_fail") == 0L,
        "the driver corpus is contract-clean (ExpectationsSpec)")
    }
    // share sums to 1 over languages (one corpus, one budget)
    val shareSum = out.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
    val wSum = out.map(_.getAs[Double]("alpha_weight")).sum
    assert(math.abs(wSum - 1.0) < 1e-9)
    assert(out.map(_.getAs[Long]("expected_draws")).sum
      <= Mixing.DrawBudget)
    // α < 1 tempers: the largest-share lang gets LESS than its share,
    // the smallest gets MORE (the whole point of temperature mixing)
    val byShare = out.sortBy(_.getAs[Double]("share"))
    assert(byShare.last.getAs[Double]("alpha_weight") <
      byShare.last.getAs[Double]("share") + 1e-12)
    assert(byShare.head.getAs[Double]("alpha_weight") >
      byShare.head.getAs[Double]("share") - 1e-12)
  }

  test("X153: kept counts agree with the X22 verdict ledger") {
    val keptByLang = CurationMix.curationMix(spark, sfDir)
      .select($"lang", $"n_kept").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ledger = CorpusIndex.curationVerdicts(spark, sfDir)
      .filter($"verdict" === "kept")
      .join(Tables.documents(spark, sfDir).select($"doc_id", $"lang"),
        Seq("doc_id"))
      .groupBy($"lang").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(keptByLang == ledger)
  }

  test("X153: a dirty corpus is dropped by the gate, not mixed in") {
    val docs = Seq(
      (1L, "good text here", "en", "src1", 14L),
      (2L, "more good text", "en", "src1", 14L),
      (3L, "bad source doc", "en", "BAD!", 14L),   // gate: source format
      (4L, "bad lang doc ok", "xx", "src2", 15L),  // gate: lang domain
      (5L, "fine document x", "es", "src2", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // hand ledger: everyone kept — isolates the GATE's contribution
    val ledger = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
      .withColumn("verdict", lit("kept"))
    val out = CurationMix.mixOf(docs, ledger).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("en").getAs[Long]("n_gate_fail") == 1L)
    assert(out("en").getAs[Long]("n_kept") == 2L)
    assert(out("xx").getAs[Long]("n_gate_fail") == 1L)
    assert(out("xx").getAs[Long]("n_kept") == 0L)
    assert(out("xx").getAs[Long]("expected_draws") == 0L,
      "a fully-gated-out language gets zero draws")
    assert(out("es").getAs[Long]("n_kept") == 1L)
    // draws follow surviving mass only
    val draws = out.values.map(_.getAs[Long]("expected_draws")).sum
    assert(draws <= Mixing.DrawBudget)
  }

  test("X153: NULL fields and unledgered rows conserve the funnel") {
    // round-13 advice item: a NULL text or n_chars used to make gate_ok
    // NULL (in n_raw, in NO bucket); a NULL or unledgered doc_id used to
    // vanish from n_raw entirely via the inner ledger join. Both must
    // now bucket as gate failures, keeping the funnel conservation law
    // on genuinely dirty corpora.
    val docs = Seq(
      (java.lang.Long.valueOf(1L), "good text here", "en", "src1",
        java.lang.Long.valueOf(14L)),
      (java.lang.Long.valueOf(2L), null, "en", "src1",
        java.lang.Long.valueOf(9L)),                  // NULL text
      (java.lang.Long.valueOf(3L), "no length meta", "en", "src1",
        null),                                        // NULL n_chars
      (null, "orphan no key doc", "en", "src1",
        java.lang.Long.valueOf(17L)),                 // NULL doc_id
      (java.lang.Long.valueOf(9L), "not in ledger ok", "en", "src1",
        java.lang.Long.valueOf(16L)))                 // unledgered
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ledger = Seq(1L, 2L, 3L).toDF("doc_id")
      .withColumn("verdict", lit("kept"))
    val out = CurationMix.mixOf(docs, ledger).collect()
      .map(r => r.getString(0) -> r).toMap
    val en = out("en")
    assert(en.getAs[Long]("n_raw") == 5L,
      "NULL-key and unledgered rows must still count in n_raw")
    assert(en.getAs[Long]("n_gate_fail") == 4L,
      "NULL text, NULL n_chars, NULL doc_id, unledgered ⇒ gate failures")
    assert(en.getAs[Long]("n_kept") == 1L)
    assert(en.getAs[Long]("n_raw") ==
      en.getAs[Long]("n_gate_fail") + en.getAs[Long]("n_low_quality") +
        en.getAs[Long]("n_dup") + en.getAs[Long]("n_kept"),
      "funnel conservation must hold on the dirty corpus")
  }

  test("X153: partition-count invariance") {
    val docs = Tables.documents(spark, sfDir)
    val ledger = CorpusIndex.curationVerdicts(spark, sfDir)
    val one = CurationMix.mixOf(docs, ledger)
      .collect().map(_.toString).toSeq
    val many = CurationMix.mixOf(docs.repartition(13),
      ledger.repartition(7)).collect().map(_.toString).toSeq
    assert(one == many)
  }
}
