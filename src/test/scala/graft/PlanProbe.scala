package graft

/** Dev-only: print the executed plan of one registered query.
  * Usage: sbt "Test/runMain graft.PlanProbe <queryName> [sfDir]" */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("=== EXECUTED PLAN " + name)
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
