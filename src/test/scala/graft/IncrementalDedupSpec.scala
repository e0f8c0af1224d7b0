package graft

import graft.ops.{Dedup, IncrementalDedup}

/** X56 — incremental-ingest screen: decisions must be derivable from the
  * symmetric X2 pair set (the asymmetric band join drops only
  * existing×existing pairs, never a batch-touching candidate), statuses
  * and match ids must follow the documented rule, and the plan must stay
  * cartesian-free.
  */
class IncrementalDedupSpec extends SparkSpec {

  test("X56: decisions equal the rule applied to the symmetric pair set") {
    // symmetric verified pairs (doc_a < doc_b) from the X2 machinery
    val pairs = Dedup.minhashPairs(
      Dedup.shinglesOf(Tables.documents(spark, sfDir)))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val expected = {
      // for each odd (new) doc: partners = even docs in either direction,
      // plus smaller odd docs
      val partnersOf = collection.mutable.Map[Long, Set[Long]]()
        .withDefaultValue(Set.empty)
      pairs.foreach { case (a, b) =>
        if (b % 2 == 1 && (a % 2 == 0 || a < b))
          partnersOf(b) = partnersOf(b) + a
        if (a % 2 == 1 && b % 2 == 0)
          partnersOf(a) = partnersOf(a) + b
      }
      partnersOf.toMap.map { case (d, ps) =>
        val existing = ps.filter(_ % 2 == 0)
        val status = if (existing.nonEmpty) "dup_of_existing" else "dup_in_batch"
        val matchId = if (existing.nonEmpty) existing.min else ps.min
        d -> ((status, ps.size.toLong, matchId))
      }
    }

    val got = IncrementalDedup.incrementalDedup(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[String]("status"), r.getAs[Long]("n_matches"),
          r.getAs[Long]("match_id")))).toMap
    assert(expected.nonEmpty, "fixture must reject some batch docs")
    assert(got == expected)
    // every rejected doc is a batch (odd) doc
    got.keys.foreach(d => assert(d % 2 == 1, s"doc $d is not a batch doc"))
  }

  test("X56: cartesian-free plan") {
    val df = IncrementalDedup.incrementalDedup(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
