package graft

import graft.ops.Vocab

/** X50 — vocabulary coverage: curve monotonicity/validity on the
  * corpus, hand-corpus rank arithmetic, and the no-global-window plan
  * (TakeOrderedAndProject + triangular broadcast join, no
  * SinglePartition funnel — PlanLintSpec re-checks globally).
  */
class VocabSpec extends SparkSpec {

  test("X50: ranks are dense, freqs non-increasing, coverage monotone") {
    import spark.implicits._
    val rows = Vocab.vocabCoverage(spark, sfDir).collect()
    val vocab = Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.split(
          org.apache.spark.sql.functions.trim(
            org.apache.spark.sql.functions.lower($"text")), "\\s+")).as("w"))
      .distinct().count()
    assert(rows.length == math.min(Vocab.TopV.toLong, vocab),
      s"expected min(TopV, vocab=$vocab) rows, got ${rows.length}")
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length.toLong))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("freq") >= b.getAs[Long]("freq"))
        assert(a.getAs[Double]("cum_share") < b.getAs[Double]("cum_share"))
      case _ =>
    }
    val last = rows.last.getAs[Double]("cum_share")
    assert(last > 0 && last <= 1.0)
  }

  test("X50: rank and cumulative share on a known corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a a a b b c")).toDF("doc_id", "text")
    val rows = Vocab.coverageOf(docs, topV = 2).collect()
      .map(r => r.getAs[Long]("rank") ->
        ((r.getAs[String]("word"), r.getAs[Long]("freq"),
          r.getAs[Double]("cum_share")))).toMap
    assert(rows(1L) == (("a", 3L, 3.0 / 6)))
    assert(rows(2L) == (("b", 2L, 5.0 / 6)))
  }

  test("X50: the top cut is TakeOrderedAndProject, the curve join broadcasts") {
    val df = Vocab.vocabCoverage(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-V must not be a global sort:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the triangular curve join must broadcast the V-row table:\n$plan")
    assert(!plan.contains("Window"),
      s"no global ordered window allowed (SinglePartition funnel):\n$plan")
  }
}
