package graft

/** Global plan lint over EVERY registered query: structural anti-patterns
  * that would be scale-killers at 100 TB fail the suite, no matter which
  * operator introduces them.
  *
  *  - `CartesianProductExec`: an all-pairs join that slipped past the
  *    blocking/broadcast discipline (broadcast nested-loop joins of tiny
  *    sides are fine and print differently).
  *  - `Exchange SinglePartition`: the whole dataset funneled into ONE
  *    task — what an un-partitioned window, a global non-top-k limit, or
  *    a stray coalesce(1)/repartition(1) plans to. One shape is allowed:
  *    a SinglePartition exchange whose immediate child is a PARTIAL
  *    aggregate (`HashAggregate(... functions=[partial_...`) — that is a
  *    global scalar aggregate moving one pre-aggregated row per map
  *    partition (x06's corpus count, x25's single-pass profile — Hash or Sort flavor), not a
  *    data funnel.
  */
class PlanLintSpec extends SparkSpec {

  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.queryExecution.executedPlan.execute().foreach(_ => ())
    df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
  }

  /** SinglePartition exchanges whose immediate child is NOT a partial
    * aggregate (see object doc).
    */
  private def dataFunnels(plan: String): Seq[String] = {
    val lines = plan.linesIterator.toVector
    lines.zipWithIndex
      .filter(_._1.contains("Exchange SinglePartition"))
      // a ReusedExchange line only REFERENCES an exchange checked at its
      // original site — reuse is plan-sharing, not a second funnel
      .filterNot(_._1.contains("ReusedExchange"))
      .collect { case (line, i)
        if !(i + 1 < lines.length &&
          lines(i + 1).contains("Aggregate") && // Hash/Sort/ObjectHash
          lines(i + 1).contains("partial_")) => line.trim }
  }

  test("no registered query plans a cartesian product or a single-task funnel") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = finalPlan(fn(spark, sfDir))
      val cart =
        if (plan.contains("CartesianProduct")) Seq("CartesianProduct") else Nil
      (cart ++ dataFunnels(plan)).map(o => s"$name: $o")
    }
    assert(offenders.isEmpty,
      s"scale-killer plan shapes:\n${offenders.mkString("\n")}")
  }
}
