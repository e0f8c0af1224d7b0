package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.stream.StreamCusum

/** X111 throughput + state-size evidence at bench scale: drain 1M keyed
  * events through the streaming CUSUM chart maintenance and report
  * events/sec AND the state-store row count against the user count.
  *
  * The state claim here is STRONGER than X88's state-rows == |keys|:
  * the CUSUM chart is Markov, so state per user is O(1) — a handful of
  * longs — REGARDLESS of how many days the stream spans (X101 buffers
  * the open session; X111 buffers nothing). The bench measures
  * state_rows == |users| from the engine's own stateOperators metrics
  * while every user accumulates a multi-day chart.
  *
  * Generation (a user-sweep with [[Days]] event-time days, every user
  * active every day) is setup, not timed; the timed section is the
  * keyed recursion + in-band/watermark day closes.
  *
  * Usage: `sbt "runMain graft.StreamCusumBench [nEvents]"`.
  */
object StreamCusumBench {

  val Users = 50000L
  val Days = 10L
  private val Base = 1704067200000L // 2024-01-01 UTC
  private val MsPerDay = 86400000L

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val work = Files.createTempDirectory("graft-streamcusum-")
    val srcDir = s"$work/events"
    val checkpoint = s"$work/ckpt"
    // user = fast index, day = slow index → every user sees every day;
    // within a day events spread over the day's seconds deterministically
    val src = spark.range(n).select(
      ($"id" % Users).as("user_id"),
      timestamp_millis(lit(Base)
        + (expr(s"id div ${Users}L") % Days) * MsPerDay
        + ($"id" * 1009L % 86400L) * 1000L).as("ts"))
    src.repartition(cpus.toInt).write.mode("overwrite").parquet(srcDir)
    val schema: StructType = src.schema

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val t0 = System.nanoTime()
    val query = StreamCusum.chartRows(stream)
      .writeStream
      .outputMode("append")
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9

    val stateRows = query.recentProgress.flatMap(p =>
      Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    println(f"""{"metric":"stream_cusum_events_per_sec","value":${n / sec}%.0f,"unit":"events/sec","events":$n,"seconds":$sec%.2f,"state_rows":$stateRows,"distinct_users":$Users,"days":$Days}""")
    spark.stop()
  }
}
