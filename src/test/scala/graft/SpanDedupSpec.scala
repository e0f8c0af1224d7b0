package graft

import graft.ops.SpanDedup

/** X54 — span-level dedup: per-source stats must equal a driver-side
  * brute-force tiling, zero-span docs are kept, boilerplate injection is
  * caught, and the plan stays window-free with map-side partials.
  */
class SpanDedupSpec extends SparkSpec {

  test("X54: per-source stats equal the brute-force tiling") {
    val k = SpanDedup.SpanTokens
    val rows = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val spansByDoc = rows.map { case (id, src, text) =>
      val w = text.toLowerCase.trim.split("\\s+")
      val spans = (0 until w.length / k)
        .map(i => w.slice(i * k, i * k + k).mkString(" "))
      (id, src, spans)
    }
    val freq = spansByDoc.flatMap(_._3).groupBy(identity)
      .map { case (s, xs) => s -> xs.length }
    val expected = spansByDoc.groupBy(_._2).map { case (src, ds) =>
      val nDocs = ds.length.toLong
      val nSpans = ds.map(_._3.length.toLong).sum
      val nDup = ds.flatMap(_._3).count(freq(_) >= 2).toLong
      val nDropped = ds.count { d =>
        val dup = d._3.count(freq(_) >= 2)
        d._3.nonEmpty && dup.toDouble > SpanDedup.DropRatio * d._3.length
      }.toLong
      src -> ((nDocs, nDropped, nSpans, nDup))
    }

    val got = SpanDedup.spanDedup(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_spans"), r.getAs[Long]("n_dup_spans")))).toMap
    assert(got == expected)
    assert(expected.values.map(_._4).sum > 0,
      "fixture corpus must contain duplicated spans")
  }

  test("X54: zero-span docs are kept; injected boilerplate is dropped") {
    import spark.implicits._
    val boiler = (1 to SpanDedup.SpanTokens * 2).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "s", s"$boiler unique trailing words here"), // mostly duplicated spans
      (2L, "s", boiler),                                // all spans duplicated
      (3L, "s", "short"),                               // zero spans → kept
      (4L, "s", (1 to 100).map(i => s"w$i").mkString(" ")) // unique → kept
    ).toDF("doc_id", "source", "text")
    val r = SpanDedup.spanDedupOf(docs).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_docs") == 4L)
    assert(r(0).getAs[Long]("n_dropped") == 2L,
      "both boilerplate copies must drop; the short and unique docs stay")
  }

  test("X54: window-free plan with map-side partial aggregation") {
    val df = SpanDedup.spanDedup(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Window"), s"corpus freq must be a groupBy:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"span frequency needs map-side partials:\n$plan")
  }
}
