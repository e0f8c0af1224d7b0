package graft

import org.apache.spark.sql.functions._

import graft.ops.{IndexStore, LloydIvfPq}

/** X179 — persisted index artifacts: the parquet roundtrip preserves
  * every bit the probe consumes, the loaded probe equals the built
  * probe exactly, the artifact layout is the three declared tables,
  * and the loaded ADC scan prunes to the code columns.
  */
class IndexStoreSpec extends SparkSpec {

  import spark.implicits._

  test("X179: probe over the reloaded artifact equals the built " +
    "index's probe bit-for-bit") {
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val root = s"target/index_store_spec/roundtrip"
    IndexStore.writeIvfPq(built, root)
    val loaded = IndexStore.readIvfPq(spark, root)
    val a = LloydIvfPq.probe(built).collect().map(_.toString).toSeq
    val b = LloydIvfPq.probe(loaded).collect().map(_.toString).toSeq
    assert(a == b,
      "persistence must be invisible to the probe — floats, norms, " +
        "codes, codebooks and cells all round-trip losslessly")
  }

  test("X179: the artifact holds exactly the three declared tables " +
    "with the probe-contract schemas") {
    val root = s"target/index_store_spec/layout"
    IndexStore.writeIvfPq(LloydIvfPq.ivfPqIndex(spark, sfDir), root)
    val enc = spark.read.parquet(s"$root/encoded")
    val cen = spark.read.parquet(s"$root/centroids")
    val cb = spark.read.parquet(s"$root/codebooks")
    assert(enc.columns.toSet ==
      Set("vec_id", "cell", "embedding", "nq", "codes"))
    assert(cen.columns.toSet == Set("c_cell", "c"))
    assert(cb.columns.toSet == Set("sub", "c_code", "qc"))
    // inverted lists cover the corpus; parameter tables stay
    // cell/codebook-bounded
    val n = Tables.embeddings(spark, sfDir).count()
    assert(enc.count() == n)
    assert(cen.count() <= 10L, "coarse cells are label-bounded here")
    assert(cb.count() <= (LloydIvfPq.M * LloydIvfPq.K).toLong)
  }

  test("X179: registered query equals the in-session x178 probe (the " +
    "oracle they share certifies the same rows)") {
    val reg = SparkEntry.queries("x179_ivfpq_persisted_topk")(spark, sfDir)
    val x178 = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
    assert(reg.collect().map(_.toString).toSeq ==
      x178.collect().map(_.toString).toSeq)
    assert(SparkEntry.oracleSql("x179_ivfpq_persisted_topk") ==
      SparkEntry.oracleSql("x178_ivfpq_topk"),
      "one training chain, two query paths — the oracle is shared by " +
        "declared design")
  }

  test("X179+X180: the full production loop — build, persist, ingest " +
    "an arrival, append, reload, and the probe finds it") {
    import graft.stream.StreamIndexIngest
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val root = s"target/index_store_spec/loop"
    IndexStore.writeIvfPq(built, root)
    // an arrival that is query 0's near-duplicate (tiny perturbation):
    // it must enter query 0's top-5 once appended
    val q0 = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" === 0L).select($"embedding")
      .collect().head.getSeq[Float](0).toArray
    val nv = q0.clone(); nv(0) = nv(0) + 1e-4f
    val arrival = Seq((888888L, nv)).toDF("vec_id", "embedding")
    val encoded = StreamIndexIngest.encodeArrivals(arrival,
      StreamIndexIngest.centroidRow(built.centroids),
      StreamIndexIngest.codebookFlatRow(built.codebooks))
    // append lands INSIDE the arrival's inverted-list directory — the
    // cell-partitioned layout makes the X180 append exactly "add to
    // the inverted list", file-system-literally
    encoded.write.partitionBy("cell").mode("append")
      .parquet(s"$root/encoded")
    val grown = IndexStore.readIvfPq(spark, root)
    assert(grown.encoded.count() == built.encoded.count() + 1,
      "the artifact grew by exactly the ingested row")
    val top = LloydIvfPq.probe(grown)
      .filter($"query_id" === 0L).collect()
    assert(top.exists(r => r.getAs[Long]("vec_id") == 888888L &&
      r.getAs[Int]("rnk") == 1),
      s"the near-duplicate arrival must rank first for its query, got " +
        top.map(_.toString).mkString(", "))
  }

  test("X179: the encoded artifact is cell-partitioned and a probed-" +
    "cell read PRUNES to the probed partitions at the file level") {
    val root = s"target/index_store_spec/cellpart"
    IndexStore.writeIvfPq(LloydIvfPq.ivfPqIndex(spark, sfDir), root)
    // layout: one directory per inverted list
    val dirs = new java.io.File(s"$root/encoded").listFiles()
      .filter(_.isDirectory).map(_.getName).toSeq
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("cell=")),
      s"expected cell=* partition directories, got $dirs")
    // a probed-cell read carries a PartitionFilters entry and scans
    // only that partition — the corpus outside the probed cells is
    // never READ, not merely joined away
    val loaded = IndexStore.readIvfPq(spark, root)
    val pruned = loaded.encoded.filter($"cell" === 3L)
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"partition filter must reach the artifact scan:\n$plan")
    assert(pruned.count() == LloydIvfPq.ivfPqIndex(spark, sfDir)
      .encoded.filter($"cell" === 3L).count(),
      "the pruned partition holds exactly that inverted list")
    // and the REGISTERED persisted probe carries the literal probed-
    // cell partition filter (probe planning pushes the cell ids, not
    // relying on the DPP heuristic) — the artifact scan reads only
    // the probed inverted-list directories
    val reg = SparkEntry.queries("x179_ivfpq_persisted_topk")(spark, sfDir)
    val regPlan = reg.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell[^\\]]*IN \\("
      .r.findFirstIn(regPlan).isDefined ||
      regPlan.contains("cell#") && regPlan.contains(" IN ("),
      s"probed-cell partition filter must reach the artifact scan:\n" +
        regPlan.take(4000))
  }

  test("X179: the loaded ADC scan reads only the columns it needs — " +
    "codes and cell, never the floats") {
    val root = s"target/index_store_spec/prune"
    IndexStore.writeIvfPq(LloydIvfPq.ivfPqIndex(spark, sfDir), root)
    val loaded = IndexStore.readIvfPq(spark, root)
    // the candidate stage before rerank: project only what ADC needs
    val adcOnly = loaded.encoded.select($"vec_id", $"cell", $"codes")
    val plan = adcOnly.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") &&
      !plan.split("ReadSchema")(1).takeWhile(_ != '\n').contains("embedding"),
      s"column pruning must reach the artifact scan:\n$plan")
  }
}
