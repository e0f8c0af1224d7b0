package graft

import org.apache.spark.sql.SparkSession

/** Cache-hygiene audit (round-15 verdict item 3): runs every registered
  * query at sf0.001 and reports which leave a session-lifetime
  * InMemoryRelation behind (a `.cache()` on a registered path with no
  * unpersist). The target state is an empty report: op-internal
  * materialization uses localCheckpoint (reclaimed by the context
  * cleaner when the frame is unreachable), and the only long-lived
  * cached state is the explicitly-managed CorpusIndex / trained-index
  * checkpoints — which are NOT CacheManager entries.
  *
  * Usage: sbt "runMain graft.CacheAudit [sfDir]"
  */
object CacheAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    var leaks = List.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      spark.catalog.clearCache()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        if (!spark.sharedState.cacheManager.isEmpty) {
          leaks ::= name
          println(s"[cache-audit] LEAK $name")
        }
      } catch {
        case e: Throwable =>
          println(s"[cache-audit] ERROR $name: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    println(s"[cache-audit] ${leaks.size} leaking queries of " +
      s"${SparkEntry.queries.size}: ${leaks.sorted.mkString(", ")}")
    spark.stop()
  }
}
