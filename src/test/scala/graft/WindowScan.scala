package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Dev-only: list every registered query whose executed plan contains an
  * empty-partitionSpec WindowExec, and whether a limit bounds its input. */
object WindowScan {
  def children(p: SparkPlan): Seq[SparkPlan] = p match {
    case q: QueryStageExec => Seq(q.plan)
    case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => Seq(r.child)
    case _ => p.children
  }
  def closure(p: SparkPlan): Seq[SparkPlan] =
    p +: children(p).flatMap(closure)
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.HarnessLog.quietCheckpointWarns()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        df.queryExecution.executedPlan.execute().foreach(_ => ())
        val plan = df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        closure(plan).collect { case w: WindowExec if w.partitionSpec.isEmpty =>
          val sub = closure(w.child)
          val bounded = sub.exists {
            case _: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => true
            case _: org.apache.spark.sql.execution.LocalLimitExec => true
            case _: org.apache.spark.sql.execution.GlobalLimitExec => true
            case _: org.apache.spark.sql.execution.CollectLimitExec => true
            case _ => false
          }
          println(s"GLOBALWINDOW $name bounded=$bounded child=${w.child.nodeName} sub=${sub.map(_.nodeName).take(8).mkString(",")}")
        }
        spark.catalog.clearCache()
      } catch { case e: Throwable => println(s"GLOBALWINDOW $name FAILED ${e.getMessage.take(60)}") }
    }
    spark.stop()
  }
}
