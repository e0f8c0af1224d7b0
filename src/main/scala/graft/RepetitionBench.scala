package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the X27 native expression: the fused
  * RepetitionCounts pass vs the interpreted lambda reference form, on a
  * 10× replica of the sf0.1 documents table (row-local operator, so
  * plain doc_id-offset replication is a faithful scale-up). Prints one
  * JSON line with medians.
  *
  * Protocol (matches StreamDedupBench): both forms measured in the SAME
  * warm session, alternating reps, median of 5 — warm-vs-fresh session
  * skew and slow drift hit both sides equally.
  */
object RepetitionBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    val big = (0 until 10).map(k =>
        base.select(($"doc_id" + lit(k * 1000000L)).as("doc_id"), $"text"))
      .reduce(_ unionByName _)
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint() // freeze the input so neither side pays the build
    val nDocs = big.count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(df: org.apache.spark.sql.DataFrame): Double =
      time(df.write.format("noop").mode("overwrite").save())
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // alternate forms per rep; one untimed warmup each
    run(ops.Repetition.repetitionOf(big))
    run(ops.Repetition.repetitionOfLambda(big))
    val reps = 5
    val (nat, lam) = (1 to reps).map { _ =>
      (run(ops.Repetition.repetitionOf(big)),
        run(ops.Repetition.repetitionOfLambda(big)))
    }.unzip

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"bench":"repetition_counts","docs":$nDocs,"reps":$reps,""" +
      s""""native_sec":${f(median(nat))},"lambda_sec":${f(median(lam))},""" +
      s""""speedup":${f(median(lam) / median(nat))}}""")
    spark.stop()
  }
}
