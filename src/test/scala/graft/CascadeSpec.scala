package graft

import graft.ops.Cascade

/** X72 — filter-cascade attrition ledger: first-fail attribution must
  * match a driver-side rule replay, the ledger must conserve documents
  * stage to stage, and the plan must be one map pass + one global
  * partial-aggregated row (no window, no per-rule re-scan).
  */
class CascadeSpec extends SparkSpec {

  private def replay(): Seq[(Int, Long)] = {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(_.getAs[String]("text"))
    val firstFail = docs.map { t =>
      val words = t.trim.toLowerCase.split("\\s+").toSeq
      val nTokens = words.length.toLong
      val nStop = words.count(w => w == "the" || w == "a").toLong
      val swc = t.toLowerCase.replaceAll("\\s+", "").length.toLong
      val nDistinct = words.distinct.length.toLong
      if (nTokens < 24) 1
      else if (nStop * 25 < nTokens) 2
      else if (swc * 10 > nTokens * 48) 3
      else if ((nTokens - nDistinct) * 3 > nTokens * 2) 4
      else 0
    }
    (1 to 4).map(r => r -> firstFail.count(_ == r).toLong)
  }

  test("X72: ledger equals a driver-side first-fail replay") {
    val got = Cascade.filterCascade(spark, sfDir).collect()
      .map(r => (r.getAs[Int]("rule_order"),
        (r.getAs[String]("rule"), r.getAs[Long]("n_reaching"),
          r.getAs[Long]("n_dropped"), r.getAs[Long]("n_remaining"))))
    val drops = replay().toMap
    val total = Tables.documents(spark, sfDir).count()
    assert(got.map(_._1).toSeq == Seq(1, 2, 3, 4))
    var reaching = total
    got.foreach { case (order, (_, nr, nd, nrem)) =>
      assert(nr == reaching, s"rule $order n_reaching")
      assert(nd == drops(order), s"rule $order n_dropped")
      assert(nrem == nr - nd, s"rule $order n_remaining")
      reaching = nrem
    }
  }

  test("X72: stage conservation — remaining(i) feeds reaching(i+1)") {
    val rows = Cascade.filterCascade(spark, sfDir).collect()
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("n_remaining") == b.getAs[Long]("n_reaching"))
    }
  }

  test("X72: one map pass + global partial agg, no window") {
    val plan = Cascade.filterCascade(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window in the ledger plan:\n$plan")
    assert(plan.contains("partial"),
      s"conditional counts must partial-aggregate map-side:\n$plan")
    // exactly one scan of documents — the rules never trigger a re-read
    val scans = "FileScan parquet".r.findAllIn(plan).length +
      "Scan parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"documents must be scanned once:\n$plan")
  }
}
