package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only measurement for the X29 two-phase quota: the salted
  * two-phase top-N vs the naive whole-stratum window, on a synthetic
  * single-stratum corpus (the worst case the operator exists for: ONE
  * language holding every row, which the naive plan funnels through one
  * task). Scores are deterministic pseudo-randoms; the scored input is
  * checkpointed so neither side pays the build. Prints one JSON line.
  */
object MixingBench {
  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_MIXBENCH_ROWS", "4000000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val scored = spark.range(rows)
      .select($"id".as("doc_id"), lit("en").as("lang"),
        (pmod(graft.functions.Hashing.md5Long40($"id".cast("string")), lit(1000000L))
          .cast("double") / 1e6).as("quality_score"))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint()
    val n = scored.count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def run(df: org.apache.spark.sql.DataFrame): Double =
      time(df.write.format("noop").mode("overwrite").save())
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val quota = ops.Mixing.QuotaN
    // shipped form: single window + Spark's WindowGroupLimit pushdown
    def shipped = ops.Mixing.quotaOfScored(scored, quota)
    // reference: the hand-rolled salted two-phase it was measured against
    def twoPhase =
      ops.Mixing.quotaTwoPhaseScored(scored, quota, ops.Mixing.QuotaSalts)

    run(shipped); run(twoPhase) // warmups
    val reps = 5
    val (sh, tp) = (1 to reps).map(_ => (run(shipped), run(twoPhase))).unzip

    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"bench":"quality_quota","rows":$n,"strata":1,"reps":$reps,""" +
      s""""shipped_window_sec":${f(median(sh))},"two_phase_sec":${f(median(tp))},""" +
      s""""shipped_speedup":${f(median(tp) / median(sh))}}""")
    spark.stop()
  }
}
