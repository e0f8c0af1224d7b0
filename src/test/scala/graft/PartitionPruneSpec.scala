package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.PartitionPrune

/** B33 — partition pruning: the partitioned layout written by the
  * seam, static directory skipping, and dynamic partition pruning
  * (the join-driven scan filter), all read from the executed plan.
  */
class PartitionPruneSpec extends SparkSpec {

  import spark.implicits._

  private lazy val factPath: String = {
    val dir = Files.createTempDirectory("ppart").toString + "/events"
    val ev = Tables.events(spark, sfDir)
      .withColumn("day", date_format($"ts", "yyyy-MM-dd"))
    PartitionPrune.partitionedWrite(ev, "day", dir)
    dir
  }

  test("B33: partitionedWrite lays out one directory per value") {
    val dirs = new java.io.File(factPath).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("day="))
    val days = Tables.events(spark, sfDir)
      .select(date_format($"ts", "yyyy-MM-dd")).distinct().count()
    assert(dirs.length == days, s"expected $days day= dirs, got ${dirs.length}")
  }

  test("B33: a literal partition predicate prunes statically") {
    // partition values are type-inferred on read (yyyy-MM-dd ⇒ DATE);
    // compare through strings — the directory names are strings anyway
    val day = spark.read.parquet(factPath)
      .select($"day".cast("string")).orderBy("day").limit(1)
      .collect()(0).getString(0)
    val df = PartitionPrune.staticPruned(spark, factPath, "day", day)
    val scan = df.queryExecution.executedPlan.toString.linesIterator
      .find(_.contains("FileScan")).get
    assert(scan.contains("PartitionFilters") &&
        "day#\\d+ = ".r.findFirstIn(scan).nonEmpty,
      s"partition predicate must reach PartitionFilters:\n$scan")
    // the pruned scan reads exactly the one matching directory
    // (inputFiles lists the PRE-pruning index — use the scan metric)
    df.collect()
    val numFiles = df.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value }
    assert(numFiles == Seq(1L),
      s"pruned scan must read exactly 1 file, read $numFiles")
  }

  test("B33: a join-only partition predicate prunes dynamically") {
    // DPP fires when the dim side carries a SELECTIVE predicate (a
    // Filter, not just a limit) — build an independent dim table with
    // a real filter, as a star-schema query would have
    val days = spark.read.parquet(factPath)
      .select($"day".cast("string")).distinct().orderBy("day").limit(3)
      .collect().map(_.getString(0))
    assume(days.length >= 3, "need ≥3 partitions for a selective dim")
    // the dim must be a real table: a filtered LocalRelation constant-
    // folds away, leaving no selective predicate for the DPP rule
    val dimPath = Files.createTempDirectory("ppart_dim").toString + "/dim"
    days.zipWithIndex.toSeq.toDF("day_s", "idx")
      .select($"day_s".cast("date").as("day"), $"idx")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"idx" < 2).select($"day")
    val df = PartitionPrune.dppJoin(spark, factPath, "day", dim)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"expected an injected dynamicpruning subquery in the fact scan:\n$plan")
    // semantic check: join result only contains the two wanted days
    val got = df.select($"day".cast("string")).distinct()
      .collect().map(_.getString(0)).sorted
    assert(got.sameElements(days.take(2).sorted))
  }
}
