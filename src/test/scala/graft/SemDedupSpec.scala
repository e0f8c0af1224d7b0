package graft

import org.apache.spark.sql.functions._

import graft.ops.SemDedup

/** X145 — SemDeDup: hand fixture (identical pair dedups, keeper is the
  * lower id; distant vector survives), structural laws on the corpus
  * (exactly one keeper per cluster, clusters are cell-contained,
  * singletons all keep), and partition invariance.
  */
class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  test("X145: identical pair collapses to one keeper; distant vector kept") {
    // one label block seeds one centroid, so all three share a cell;
    // v1 == v2 are exact duplicates, v3 is near-orthogonal
    val e = Seq(
      (1L, "a", Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, "a", Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (3L, "a", Array(0.0f, 1.0f, 0.0f, -0.1f)))
      .toDF("vec_id", "label", "embedding")
    val out = SemDedup.semOf(e).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toList
    // identical vectors tie on cos_cent -> keeper is the lower vec_id
    assert(out == List((1L, 1L, 2L, true), (2L, 1L, 2L, false),
      (3L, 3L, 1L, true)))
  }

  test("X145: exactly one keeper per cluster; singletons all keep") {
    val out = SemDedup.semDedup(spark, sfDir)
    val perCluster = out.groupBy($"cluster_id")
      .agg(count(lit(1)).as("n"),
        sum(when($"keep", 1L).otherwise(0L)).as("keepers"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getAs[Long]("keepers") == 1L,
        s"cluster ${r.get(0)}: ${r.get(2)} keepers")
    }
    // the corpus must actually exercise multi-member clusters
    assert(perCluster.exists(_.getAs[Long]("n") > 1L),
      "fixture corpus produced no semantic duplicates — τ miscalibrated")
  }

  test("X145: clusters never span cells") {
    val cellsPerCluster = SemDedup.semDedup(spark, sfDir)
      .groupBy($"cluster_id")
      .agg(countDistinct($"cell").as("n_cells")).collect()
    cellsPerCluster.foreach(r =>
      assert(r.getAs[Long]("n_cells") == 1L,
        s"cluster ${r.get(0)} spans ${r.get(1)} cells"))
  }

  test("X145: partition-count invariance") {
    val e = Tables.embeddings(spark, sfDir)
    val one = SemDedup.semOf(e).collect().map(_.toString).toSeq
    val many = SemDedup.semOf(e.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("X145: unset cap seam — registered query is bit-equal lossless") {
    sys.props.remove("graft.maxCellSize")
    assert(graft.ops.ScaleCaps.maxCellSize == Long.MaxValue)
    val e = Tables.embeddings(spark, sfDir)
    assert(rows(SparkEntry.queries("x145_semdedup")(spark, sfDir))
      == rows(SemDedup.semOf(e, Long.MaxValue)))
  }

  test("X145: set cap seam — cells split, candidates shrink, laws hold") {
    sys.props("graft.maxCellSize") = "4"
    try {
      val e = Tables.embeddings(spark, sfDir)
      // the REGISTERED query responds to the posture setting
      assert(rows(SparkEntry.queries("x145_semdedup")(spark, sfDir))
        == rows(SemDedup.semOf(e, 4L)))
      // capped candidate pairs are a strict subset of lossless pairs
      // (cells here are far larger than 4, so the split must bite)
      val best = SemDedup.bestOf(e)
      def pairSet(cap: Long) =
        SemDedup.candidatePairsOf(best, cap)
          .select(col("x.vec_id"), col("y.vec_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val capped = pairSet(4L)
      val lossless = pairSet(Long.MaxValue)
      assert(capped.subsetOf(lossless))
      assert(capped.size < lossless.size,
        "a cap of 4 must drop candidates at this corpus")
      // the capped verdict still has exactly one keeper per cluster
      val perCluster = SemDedup.semOf(e, 4L).groupBy($"cluster_id")
        .agg(sum(when($"keep", 1L).otherwise(0L)).as("keepers"))
        .collect()
      perCluster.foreach(r => assert(r.getAs[Long]("keepers") == 1L))
    } finally sys.props.remove("graft.maxCellSize")
  }

  test("X145: the cap drops EXACTLY the pairs the hash split separates") {
    // the CapRecallSpec discipline applied to the cell cap: replay the
    // sub-cell assignment driver-side (same hash, same ceil(n/cap)
    // modulus) and demand SET equality with the engine's capped and
    // lossless candidate streams — the cap's loss mode is then a
    // theorem about the split, not an observation about counts
    val cap = 4L
    val best = SemDedup.bestOf(Tables.embeddings(spark, sfDir))
    val rows = best.select($"vec_id", $"cell",
        graft.functions.Hashing.md5Long40($"vec_id".cast("string"))
          .as("h"))
      .collect()
      .map(r => (r.getAs[Number]("vec_id").longValue,
        r.getAs[Number]("cell").longValue,
        r.getAs[Number]("h").longValue))
    val byCell = rows.groupBy(_._2)
    def pairsOf(groups: Iterable[Seq[(Long, Long, Long)]]) =
      groups.flatMap { ms =>
        for (a <- ms; b <- ms if a._1 < b._1) yield (a._1, b._1)
      }.toSet
    val losslessExp = pairsOf(byCell.values.map(_.toSeq))
    val cappedExp = pairsOf(byCell.values.flatMap { ms =>
      val nsub = math.max(
        math.ceil(ms.length.toDouble / cap).toLong, 1L)
      ms.groupBy(m => java.lang.Math.floorMod(m._3, nsub))
        .values.map(_.toSeq)
    })
    def got(c: Long) = SemDedup.candidatePairsOf(best, c)
      .select(col("x.vec_id"), col("y.vec_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got(Long.MaxValue) == losslessExp)
    assert(got(cap) == cappedExp,
      "capped candidates must be exactly the within-(cell, sub) pairs")
    assert(cappedExp.subsetOf(losslessExp))
    assert((losslessExp -- cappedExp).nonEmpty,
      "the fixture must actually exercise the split")
  }
}
