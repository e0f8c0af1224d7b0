package graft

import org.apache.spark.sql.functions._

import graft.ops.{IndexStaleness, IndexStore, LloydIvfPq}

/** X182 — index-staleness audit: the training corpus audited against
  * its own artifact is exactly ratio-1 everywhere (no false alarm, by
  * the fixpoint law), the registered ×2-drifted batch alarms in every
  * cell, and the audit's error measure agrees with the index's own
  * stored encoding.
  */
class IndexStalenessSpec extends SparkSpec {

  import spark.implicits._

  test("X182: the training corpus against its own artifact is exactly " +
    "ratio 1.0 in every cell — no false alarm") {
    val corpus = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val self = IndexStaleness.auditOf(spark, sfDir, corpus).collect()
    assert(self.nonEmpty)
    self.foreach { r =>
      assert(r.getAs[Long]("arr_n") == r.getAs[Long]("train_n"),
        s"cell ${r.getAs[Long]("cell")}: self-audit must re-assign every " +
          "vector to its stored cell")
      assert(r.getAs[Long]("arr_sum_err") == r.getAs[Long]("train_sum_err"))
      assert(r.getAs[Long]("arr_sum_d2") == r.getAs[Long]("train_sum_d2"))
      assert(r.getAs[Double]("err_ratio") == 1.0,
        "identical sums and counts divide to exactly 1.0")
      assert(!r.getAs[Boolean]("alarm"),
        "the training corpus must never alarm against its own artifact")
    }
  }

  test("X182: the registered drifted batch alarms in every cell, " +
    "clear of the threshold") {
    val rows = SparkEntry.queries("x182_index_staleness")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("alarm"),
        s"cell ${r.getAs[Long]("cell")}: the x2 norm drift must alarm")
      assert(r.getAs[Double]("err_ratio") > IndexStaleness.AlarmRatio,
        "alarm must be the err_ratio predicate, verbatim")
    }
    // every training cell is reported exactly once, in cell order
    val cells = rows.map(_.getAs[Long]("cell")).toSeq
    assert(cells == cells.sorted && cells.distinct == cells)
  }

  test("X182: the audit's ADC error equals the error of the index's " +
    "own stored encoding (encoding is the argmin the audit minimizes)") {
    val index = IndexStore.readIvfPq(spark,
      IndexStore.ensureRoot(spark, sfDir))
    val centRow = graft.stream.StreamIndexIngest.centroidRow(index.centroids)
    val cbRow = graft.stream.StreamIndexIngest.codebookRow(index.codebooks)
    val corpus = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    val audited = IndexStaleness.encodeStats(corpus, centRow, cbRow)
    // per-vector error recomputed from the STORED codes: the distance
    // of the assigned (not re-minimized) codebook entry
    val stored = index.encoded
      .join(broadcast(index.centroids), $"cell" === $"c_cell")
      .withColumn("qd", zip_with($"embedding", $"c", (x, y) =>
        floor(x.cast("double") * 1000000.0).cast("long")
          - floor(y.cast("double") * 1000000.0).cast("long")))
      .select($"vec_id", $"codes", posexplode(expr(
        s"transform(sequence(0, ${LloydIvfPq.M - 1}), j -> " +
          s"slice(qd, j * ${LloydIvfPq.Sub} + 1, ${LloydIvfPq.Sub}))"))
        .as(Seq("sub", "qs")))
      .select($"vec_id", $"sub".cast("long").as("vsub"), $"qs",
        element_at($"codes", ($"sub" + 1).cast("int")).as("code"))
      .join(broadcast(index.codebooks),
        $"vsub" === $"sub" && $"code" === $"c_code")
      .withColumn("d", expr(
        "aggregate(zip_with(qs, qc, (x, y) -> (x - y) * (x - y)), " +
          "0L, (acc, t) -> acc + t)"))
      .groupBy($"vec_id").agg(sum($"d").as("stored_err"))
    val joined = audited.join(stored, Seq("vec_id"))
      .filter($"adc_err" =!= $"stored_err")
    assert(joined.count() == 0L,
      "the audit's per-vector min-distance must equal the stored " +
        "encoding's distance — stored codes are the argmin")
  }

  test("X182: native audit kernel is bit-equal to the HOF reference " +
    "form (corpus and the registered drifted batch)") {
    val index = IndexStore.readIvfPq(spark,
      IndexStore.ensureRoot(spark, sfDir))
    val centRow = graft.stream.StreamIndexIngest.centroidRow(index.centroids)
    val cbRow = graft.stream.StreamIndexIngest.codebookRow(index.codebooks)
    val corpus = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    for (vecs <- Seq(corpus, IndexStaleness.driftedArrivals(corpus))) {
      val native = IndexStaleness.encodeStats(vecs, centRow, cbRow)
      val hof = IndexStaleness.encodeStatsHof(vecs, centRow, cbRow)
      assert(native.schema.map(f => (f.name, f.dataType)) ==
        hof.schema.map(f => (f.name, f.dataType)))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    }
  }
}
