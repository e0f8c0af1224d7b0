package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.stream.StreamDedup

/** Throughput benchmark for the streaming incremental near-dup stage
  * (X23): synthetic documents — 20 pseudo-random tokens each, every 5th
  * doc an exact copy of its predecessor, so ~20% of arrivals hit a
  * populated bucket — drained with Trigger.AvailableNow through
  * fingerprint → bucket fan-out → keyed-state matching into the noop
  * sink. Generation is excluded from the timed section; the measurement
  * covers signature build (row-local), the bucket shuffle, state-store
  * maintenance, and pair emission.
  */
object StreamDedupBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic corpus: token_p(doc) indexes a 211-word vocabulary by
    // an affine hash of (dup-collapsed doc id, position)
    val work = Files.createTempDirectory("graft-streamdedup-")
    val docsDir = s"$work/docs"
    val seed = when($"id" % 5 === 1, $"id" - 1).otherwise($"id")
    val tokens = (0 until 20).map(p =>
      concat(lit("w"), pmod(seed * 2654435761L + lit(p * 40503), lit(211))))
    spark.range(n)
      .select($"id".as("doc_id"), concat_ws(" ", tokens: _*).as("text"))
      .repartition(cpus.toInt)
      .write.mode("overwrite").parquet(docsDir) // setup — not timed

    // median of reps, same rationale as Bench: single-VM runs vary
    // ±20-30%; each rep gets a fresh checkpoint so state starts empty
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val times = (1 to reps).map { rep =>
      val docs = spark.readStream
        .schema(StructType(Seq(
          StructField("doc_id", LongType), StructField("text", StringType))))
        .parquet(docsDir)
      val t0 = System.nanoTime()
      val query = StreamDedup.nearDupCandidates(docs)
        .writeStream
        .outputMode("append")
        .format("noop")
        .option("checkpointLocation", s"$work/ckpt-$rep")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      (System.nanoTime() - t0) / 1e9
    }
    val sec = times.sorted.apply(times.length / 2)
    println(f"""{"metric":"stream_dedup_docs_per_sec","value":${n / sec}%.0f,"unit":"docs/sec","docs":$n,"seconds":$sec%.2f,"reps":$reps,"stat":"median"}""")
    spark.stop()
  }
}
