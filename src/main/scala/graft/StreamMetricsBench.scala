package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.stream.StreamMetrics

/** X88 throughput + state-size evidence at bench scale (round-9 verdict
  * item 5): drain 1M keyed events through the streaming metrics
  * maintenance pipeline and report events/sec AND the state-store row
  * count against the exact key count.
  *
  * The state-rows == |keys| property is the 100 TB claim behind every
  * streaming aggregate here (X23/X41/X47/X88): state holds the keyed
  * SUMMARY, never an event buffer, so it is bounded by key cardinality
  * regardless of stream length. StreamMetricsSpec pins it functionally
  * at fixture scale; this bench MEASURES it at 1M events / 50k keys
  * from the engine's own stateOperators progress metrics.
  *
  * Generation (a keyed uniform sweep — every (user % Users, type %
  * Types) combination occurs) is setup, not timed; the timed section is
  * decode-free: micro-batch partial aggregation + state merge keyed on
  * (user_id, event_type), Update-mode emission of touched keys.
  *
  * Usage: `sbt "runMain graft.StreamMetricsBench [nEvents]"`.
  */
object StreamMetricsBench {

  val Users = 10000L
  val Types = 5L

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

    val work = Files.createTempDirectory("graft-streammetrics-")
    val srcDir = s"$work/events"
    val checkpoint = s"$work/ckpt"
    // deterministic keyed events; value in exact cents (the x86/x88
    // decimal discipline)
    // type derives from id DIV Users (not id mod anything — Types
    // divides Users, so any linear residue would collapse each user
    // onto a single type and the key space to |Users|): each user sees
    // every type across the sweep → exactly Users × Types keys
    val src = spark.range(n).select(
      ($"id" % Users).as("user_id"),
      concat(lit("t"), ($"id" / Users).cast("long") % Types).as("event_type"),
      (($"id" * 37L % 100000L).cast("decimal(27,6)") / 100).cast("double")
        .as("value"))
    src.repartition(cpus.toInt).write.mode("overwrite").parquet(srcDir)
    val schema: StructType = src.schema

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val t0 = System.nanoTime()
    val query = StreamMetrics.keyedMetrics(stream)
      .writeStream
      .outputMode("update")
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9

    // the engine's own accounting of what the state store holds after
    // the drain — the measured form of state-rows == |keys|
    val stateRows = query.recentProgress.flatMap(p =>
      Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    val expectedKeys = Users * Types
    println(f"""{"metric":"stream_metrics_events_per_sec","value":${n / sec}%.0f,"unit":"events/sec","events":$n,"seconds":$sec%.2f,"state_rows":$stateRows,"distinct_keys":$expectedKeys}""")
    spark.stop()
  }
}
