package graft

import graft.ops.Bm25

/** X68 — BM25: rankings must equal a driver-side Okapi recompute over
  * the collected term stats, and the plan must be the broadcast
  * inverted-probe shape (query terms broadcast; ranking window over
  * matched postings only).
  */
class Bm25Spec extends SparkSpec {

  test("X68: top-10 per query term equals driver-side Okapi recompute") {
    val toks = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "explode(split(lower(text), '\\\\s+')) AS w")
      .where("w <> ''").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val tf = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val dl = toks.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val dfm = tf.keys.toSeq.groupBy(_._2).view.mapValues(_.length.toLong)
      .toMap
    val nDocs = dl.size.toLong
    val totalTokens = dl.values.sum
    val qterms = dfm.toSeq.filter(_._2 >= 3)
      .sortBy { case (w, d) => (d, w) }.take(5)

    def score(t: Long, docLen: Long, df: Long): Double = {
      val lenr = (docLen * nDocs).toDouble / totalTokens.toDouble
      val idf = math.log(
        (nDocs.toDouble - df.toDouble + 0.5) / (df.toDouble + 0.5) + 1.0)
      BigDecimal(idf * (t.toDouble * 2.2) /
        (t.toDouble + 1.2 * (0.25 + 0.75 * lenr)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    val expected = qterms.flatMap { case (w, df) =>
      tf.collect { case ((doc, `w`), t) => (doc, t, score(t, dl(doc), df)) }
        .toSeq.sortBy { case (doc, _, s) => (-s, doc) }.take(10)
        .zipWithIndex
        .map { case ((doc, t, s), i) => (w, i + 1L, doc, t, dl(doc), s) }
    }.toSet

    val got = Bm25.bm25TopK(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1).toLong, r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
    assert(got.map(x => (x._1, x._2, x._3)) ==
      expected.map(x => (x._1, x._2, x._3)),
      "term/rank/doc triples")
    assert(got == expected, "full rows incl. scores")
    assert(got.nonEmpty)
  }

  test("X68: plan — broadcast probe, ranking window over matches only") {
    val df = Bm25.bm25TopK(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(plan.contains("BroadcastExchange"), "query set broadcasts")
    val windows = "(?m)^.*Window .*$".r.findAllIn(plan).toSeq
    assert(windows.nonEmpty && windows.forall(_.contains("query_term")),
      windows.mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }
}
