package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.stream.StreamTopK

/** X119 throughput + state-bound evidence at bench scale: drain 1M
  * events with a heavy-tailed key distribution through the space-saving
  * shards and report events/sec AND the state row count against the
  * shard count — the O(k·S)-state-at-any-cardinality claim, measured
  * from the engine's own stateOperators metrics (the X88 protocol).
  *
  * The key distribution is deliberately heavy-tailed (id² residue —
  * half the mass lands on a few hundred hot keys, the rest sprays
  * across ~100k cold keys): a uniform sweep would never exercise
  * eviction, and eviction churn is the algorithm's actual cost center.
  *
  * Usage: `sbt "runMain graft.StreamTopKBench [nEvents]"`.
  */
object StreamTopKBench {

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

    val work = Files.createTempDirectory("graft-streamtopk-")
    val srcDir = s"$work/events"
    val checkpoint = s"$work/ckpt"
    // heavy-tailed keys: ~50% of events hit id%512 (hot head), the
    // rest spread over 100k cold keys — deterministic, no RNG
    val src = spark.range(n).select(
      when($"id" % 2 === 0, $"id" % 512L)
        .otherwise($"id" * 2654435761L % 100000L).as("user_id"),
      timestamp_micros($"id" * 1000L + 1577836800000000L).as("ts"),
      $"id".as("event_id"))
    src.repartition(cpus.toInt).write.mode("overwrite").parquet(srcDir)
    val schema: StructType = src.schema

    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val t0 = System.nanoTime()
    val query = StreamTopK.userTopK(stream)
      .writeStream
      .outputMode("update")
      .format("noop")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9

    val stateRows = query.recentProgress.flatMap(p =>
      Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    println(f"""{"metric":"stream_topk_events_per_sec","value":${n / sec}%.0f,"unit":"events/sec","events":$n,"seconds":$sec%.2f,"state_rows":$stateRows,"shards":${StreamTopK.Shards},"counters_per_shard":${StreamTopK.K}}""")
    spark.stop()
  }
}
