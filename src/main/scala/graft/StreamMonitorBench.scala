package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

import graft.ops.ContaminationMatrix
import graft.stream.{StreamAms, StreamCentroid, StreamDrift, StreamPsi, StreamQuality}

/** Round-13 streaming-monitor throughput + state-bound evidence, the
  * StreamMetricsBench protocol applied to the three new monitors:
  * X152 (drift: bounded reservoir per source), X161 (AMS: 32 linear
  * counters per source), X162 (centroids: one [n, s₀…s_D] buffer per
  * label). Generation is setup, not timed; the timed section is the
  * AvailableNow drain through each monitor into a noop sink, complete
  * mode; state_rows is read from the engine's own stateOperators
  * accounting — the measured form of the bounded-state claims the
  * specs pin functionally.
  *
  * Usage: `sbt "runMain graft.StreamMonitorBench [nRows]"`.
  */
object StreamMonitorBench {

  val Sources = 20L
  val Labels = 10L
  val Dims = 64

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

    val work = Files.createTempDirectory("graft-streammon-")

    def drain(name: String, srcDir: String, schema: StructType,
        expectState: Long)(
        monitor: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame): Unit = {
      val stream = spark.readStream.schema(schema).parquet(srcDir)
      val t0 = System.nanoTime()
      val query = monitor(stream)
        .writeStream.outputMode("complete").format("noop")
        .option("checkpointLocation", s"$work/ckpt-$name")
        .trigger(Trigger.AvailableNow())
        .start()
      query.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val stateRows = query.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
        .lastOption.getOrElse(-1L)
      println(f"""{"metric":"${name}_rows_per_sec","value":${n / sec}%.0f,"unit":"rows/sec","rows":$n,"seconds":$sec%.2f,"state_rows":$stateRows,"expected_state":$expectState}""")
    }

    // X152 — documents-shaped stream; reference = shifted lengths
    val docs = spark.range(n).select(
      concat(lit("src"), $"id" % Sources).as("source"),
      $"id".as("doc_id"),
      (($"id" * 31L) % 2000L + 20L).as("n_chars"))
    val docsDir = s"$work/docs"
    docs.repartition(cpus.toInt).write.mode("overwrite").parquet(docsDir)
    val ref152 = StreamDrift.refSamples(
      spark.read.parquet(docsDir).limit(100000)
        .withColumn("n_chars", $"n_chars" + 7L)).cache()
    ref152.count()
    drain("stream_drift", docsDir, docs.schema, Sources)(
      StreamDrift.driftMonitor(_, ref152))

    // X167 — same documents-shaped stream; reference bands from a
    // shifted 100k batch (plain SUM state — the cheapest monitor)
    val ref167 = StreamPsi.refBands(
      spark.read.parquet(docsDir).limit(100000)
        .withColumn("n_chars", $"n_chars" + 150L)).cache()
    ref167.count()
    drain("stream_psi", docsDir, docs.schema, Sources)(
      StreamPsi.psiMonitor(_, ref167))

    // X161 — (grp, v) stream; reference sketch from a 100k batch
    val kv = spark.range(n).select(
      concat(lit("src"), $"id" % Sources).as("grp"),
      concat(lit("content-"), ($"id" * 17L) % 250000L).as("v"))
    val kvDir = s"$work/kv"
    kv.repartition(cpus.toInt).write.mode("overwrite").parquet(kvDir)
    val ref161 = StreamAms.refSketch(
      spark.read.parquet(kvDir).limit(100000)).cache()
    ref161.count()
    drain("stream_ams", kvDir, kv.schema, Sources)(
      StreamAms.amsMonitor(_, ref161))

    // X168 — (user_id, event_type) stream; keyed-count buffers, state
    // bounded by the user population (the sharded axis)
    val users = 100000L
    val ev = spark.range(n).select(
      ($"id" % users).as("user_id"),
      concat(lit("type"), ($"id" * 13L) % 12L).as("event_type"))
    val evDir = s"$work/ev"
    ev.repartition(cpus.toInt).write.mode("overwrite").parquet(evDir)
    drain("stream_entropy", evDir, ev.schema, users)(
      StreamQuality.entropyMonitor(_))

    // X169 — documents-shaped stream; two cell-count buffer rows total
    val fdDocs = spark.range(n).select(
      $"id".as("doc_id"),
      concat(lit("src"), $"id" % Sources).as("source"),
      concat(lit("l"), ($"id" * 7L) % 12L).as("lang"))
    val fdDir = s"$work/fd"
    fdDocs.repartition(cpus.toInt).write.mode("overwrite").parquet(fdDir)
    drain("stream_fd", fdDir, fdDocs.schema,
      StreamQuality.StreamDeps.length.toLong)(
      StreamQuality.fdMonitor(_))

    // X174/X175 — documents-shaped stream WITH text (12 words from a
    // 50-word vocab so 6-grams exist and some hit); the pinned eval-gram
    // sets come from a 100k batch slice with the standard residues
    val tDocs = spark.range(n).select(
      $"id".as("doc_id"),
      concat(lit("src"), $"id" % Sources).as("source"),
      concat_ws(" ", (0 until 12).map(i =>
        concat(lit("w"), ($"id" * 7L + i * 3L) % 50L)): _*).as("text"))
    val tDir = s"$work/tdocs"
    tDocs.repartition(cpus.toInt).write.mode("overwrite").parquet(tDir)
    val refSets = graft.stream.StreamDecontam.evalGramSets(
      spark.read.parquet(tDir).limit(100000)).cache()
    refSets.count()
    // the guard is stateless (append mode) — drain through append
    locally {
      val stream = spark.readStream.schema(tDocs.schema).parquet(tDir)
      val t0 = System.nanoTime()
      val q = graft.stream.StreamDecontam.decontamGuard(stream, refSets)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", s"$work/ckpt-decontam-guard")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val sec = (System.nanoTime() - t0) / 1e9
      val stateRows = q.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
        .lastOption.getOrElse(0L)
      println(f"""{"metric":"stream_decontam_guard_rows_per_sec","value":${n / sec}%.0f,"unit":"rows/sec","rows":$n,"seconds":$sec%.2f,"state_rows":$stateRows,"expected_state":0}""")
    }
    drain("stream_decontam_rates", tDir, tDocs.schema,
      Sources * ContaminationMatrix.EvalSets.length)(
      graft.stream.StreamDecontam.contaminationMonitor(_, refSets))
    // X177 — same stream through the per-cell KMV sketch; state is one
    // bounded ≤K-slot buffer per LEAKY cell (≤ sources × sets here —
    // the 50-word vocab makes every cell leak, so expected = all cells)
    drain("stream_decontam_kmv", tDir, tDocs.schema,
      Sources * ContaminationMatrix.EvalSets.length)(
      graft.stream.StreamDecontam.sharedGramKmv(_, refSets))

    // X180 — streaming index ingestion: encode arrivals against the
    // frozen sf-dir artifact tables (stateless: one bounded parameter
    // row each; append mode)
    locally {
      val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
        "/root/testdata/sf0.01")
      val idx = graft.ops.LloydIvfPq.ivfPqIndex(spark, sfDir)
      val centRow = graft.stream.StreamIndexIngest
        .centroidRow(idx.centroids).cache()
      val cbRow = graft.stream.StreamIndexIngest
        .codebookFlatRow(idx.codebooks).cache()
      centRow.count(); cbRow.count()
      val nIngest = math.max(n / 16L, 10000L)
      val arrivals = spark.range(nIngest).select(
        $"id".as("vec_id"),
        expr(s"transform(sequence(1, $Dims), d -> " +
          "CAST(CAST(pmod(id * 37 + d * 101, 2000) AS DOUBLE) / 1000.0 " +
          "- 1.0 AS FLOAT))")
          .as("embedding"))
      val arrDir = s"$work/arrivals"
      arrivals.repartition(cpus.toInt).write.mode("overwrite")
        .parquet(arrDir)
      val stream = spark.readStream.schema(arrivals.schema).parquet(arrDir)
      val t0i = System.nanoTime()
      val qi = graft.stream.StreamIndexIngest
        .encodeArrivals(stream, centRow, cbRow)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", s"$work/ckpt-ingest")
        .trigger(Trigger.AvailableNow())
        .start()
      qi.awaitTermination()
      val secI = (System.nanoTime() - t0i) / 1e9
      val stateI = qi.recentProgress.flatMap(p =>
        Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
        .lastOption.getOrElse(0L)
      println(f"""{"metric":"stream_index_ingest_rows_per_sec","value":${nIngest / secI}%.0f,"unit":"rows/sec","rows":$nIngest,"seconds":$secI%.2f,"state_rows":$stateI,"expected_state":0}""")
    }

    // X162 — (label, embedding) stream at 64 dims (fewer rows: the
    // per-row payload is 64 floats, so nVec rows ≈ n in field count)
    val nVec = math.max(n / 16L, 10000L)
    val emb = spark.range(nVec).select(
      ($"id" % Labels).as("label"),
      expr(s"transform(sequence(1, $Dims), d -> " +
        "CAST(pmod(id * 37 + d * 101, 2000) AS FLOAT) / 1000.0 - 1.0)")
        .as("embedding"))
    val embDir = s"$work/emb"
    emb.repartition(cpus.toInt).write.mode("overwrite").parquet(embDir)
    val ref162 = StreamCentroid.refCentroids(
      spark.read.parquet(embDir).limit(20000)).cache()
    ref162.count()
    val streamEmb = spark.readStream.schema(emb.schema).parquet(embDir)
    val t0 = System.nanoTime()
    val q162 = StreamCentroid.centroidMonitor(streamEmb, ref162)
      .writeStream.outputMode("complete").format("noop")
      .option("checkpointLocation", s"$work/ckpt-centroid")
      .trigger(Trigger.AvailableNow())
      .start()
    q162.awaitTermination()
    val sec162 = (System.nanoTime() - t0) / 1e9
    val state162 = q162.recentProgress.flatMap(p =>
      Option(p.stateOperators).toSeq.flatten.map(_.numRowsTotal))
      .lastOption.getOrElse(-1L)
    println(f"""{"metric":"stream_centroid_rows_per_sec","value":${nVec / sec162}%.0f,"unit":"rows/sec","rows":$nVec,"seconds":$sec162%.2f,"state_rows":$state162,"expected_state":$Labels}""")

    spark.stop()
  }
}
