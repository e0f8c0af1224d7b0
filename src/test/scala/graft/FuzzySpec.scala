package graft

import graft.ops.Fuzzy

/** B41 — blocked fuzzy join: candidate generation must equal the declared
  * blocking contract (pairs sharing first or last token), distances must
  * match a reference Levenshtein, each pair must appear once, and the
  * block joins must stay equi-joins.
  */
class FuzzySpec extends SparkSpec {

  /** Classic DP edit distance — the reference implementation. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + cost)
    }
    d(a.length)(b.length)
  }

  test("B41: result equals the brute-force blocked reference") {
    val parts = Tables.part(spark, sfDir)
      .select("p_name").collect().map(_.getString(0))
    val counts = parts.groupBy(identity).map { case (n, xs) => n -> xs.length }
    val names = counts.keys.toSeq
    val expected = (for {
      a <- names; b <- names
      if a < b
      if a.split(" ").head == b.split(" ").head ||
        a.split(" ").last == b.split(" ").last
      d = lev(a, b)
      if d <= Fuzzy.MaxDist
    } yield (a, b, d.toLong, counts(a).toLong, counts(b).toLong)).toSet

    val got = Fuzzy.fuzzyJoin(spark, sfDir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("dist"), r.getAs[Long]("parts_a"), r.getAs[Long]("parts_b")))
    assert(expected.nonEmpty, "fixture vocabulary must produce fuzzy pairs")
    assert(got.length == got.toSet.size, "blocks must be disjoint — no pair twice")
    assert(got.toSet == expected)
  }

  test("B41: block joins are hash equi-joins, never cartesian") {
    val df = Fuzzy.fuzzyJoin(spark, sfDir)
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"blocking must give the join equi keys:\n$plan")
  }
}
