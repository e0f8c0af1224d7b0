package graft

import java.text.Normalizer

import graft.ops.Normalize

/** X52 — NFC normalization: the native expression must implement UAX#15
  * canonical composition exactly (pinned against java.text.Normalizer on
  * adversarial fixtures AND by explicit code-point expectations), keep
  * nulls, and the query must report the constructed suffix's composition
  * on every row. The Unicode fixtures carry raw decomposed/precomposed
  * byte sequences — the first test cross-checks them against the JDK
  * reference, so silent re-normalization of this source file would fail
  * loudly, not skew the pins.
  */
class NormalizeSpec extends SparkSpec {

  private val decomposedCafe = "café"      // e + combining acute
  private val composedCafe = "café"         // é precomposed
  private val fixtures = Seq(
    "plain ascii",
    decomposedCafe,
    composedCafe,                                 // already NFC — unchanged
    "naïve",                                // i + diaeresis → ï
    "ÅB",                                   // A + ring above → Å
    "Á̧",                              // multiple marks: acute + cedilla
    "가",                                     // Hangul syllable GA (composed)
    "가",                               // Hangul jamo G + A → 가
    s"mixed $decomposedCafe and $composedCafe in one row",
    "")

  test("X52: native expression equals java.text.Normalizer NFC on fixtures") {
    import spark.implicits._
    val got = fixtures.toDF("s")
      .select(Normalize.nfc($"s").as("n")).collect().map(_.getString(0))
    val expected = fixtures.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(got.toSeq == expected)
    // explicit code-point pins, independent of the JDK reference
    assert(got(1) == composedCafe, "decomposed sequence must compose")
    assert(got(2) == composedCafe, "already-NFC input must be unchanged")
    assert(got(3) == "naïve")
    assert(got(4) == "ÅB")
    assert(got(7) == "가", "Hangul jamo must compose")
    assert(got(8) == s"mixed $composedCafe and $composedCafe in one row")
  }

  test("X52: nulls pass through") {
    import spark.implicits._
    val rows = Seq(Some(decomposedCafe), None, Some("ascii")).toDF("s")
      .select(Normalize.nfc($"s").as("n")).collect()
    assert(rows(0).getString(0) == composedCafe)
    assert(rows(1).isNullAt(0))
    assert(rows(2).getString(0) == "ascii")
  }

  test("X52: query reports full composition — every row changed by 2 code points") {
    val rows = Normalize.normalizeText(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      assert(r.getAs[Long]("n_changed") == n,
        "the decomposed suffix must change every document")
      assert(r.getAs[Long]("chars_composed") == 2 * n,
        "NFC composes exactly two marks per row")
    }
  }

  test("X52: map-only plan — one exchange for the |sources| groups") {
    val df = Normalize.normalizeText(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Join"), s"normalization pass must not join:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, // partial-agg hash exchange + the final sort
      s"map-side pass must shuffle only aggregated groups:\n$plan")
  }
}
