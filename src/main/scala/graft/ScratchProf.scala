package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMPORARY round-19 per-stage attribution scratch — not part of any
  * query path; deleted before round end.
  */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    HarnessLog.quietCheckpointWarns()
    import spark.implicits._
    spark.range(100000).selectExpr("id", "id * 2 as x")
      .groupBy(expr("id % 7")).count()
      .write.format("noop").mode("overwrite").save()

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def med(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    def timeIt(label: String, reps: Int = 5)(body: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[prof] $label%-52s med=${med(ts)}%6.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
      med(ts)
    }
    val sections = sys.env.getOrElse("SCRATCH_SECTIONS", "floor,x145,x145x30")
      .split(",").map(_.trim).toSet

    // ---------- CC hop-depth debug on a synthetic path graph ----------
    if (sections("ccdebug")) {
      // path 0-1-2-...-299: diameter 299; expect ~log4(300)+2 ≈ 7 rounds
      val path = spark.range(299).select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
      val t0 = System.nanoTime()
      val (labels, rounds) = ops.Dedup.connectedComponentsWithRounds(path)
      val n = labels.filter($"label" === 0L).count()
      println(f"[prof] ccdebug path300: rounds=$rounds verts_at_root=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f")
    }

    // ---------- CC contraction prototype ----------
    def ccContract(pairs: DataFrame): (DataFrame, Int) = {
      import org.apache.spark.sql.graft.CheckpointBridge.withoutOriginStats
      // m: doc -> current rep (fused init round, as production)
      val edges0 = pairs
        .select(explode(array(
          struct($"doc_a", $"doc_b"),
          struct($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))).as("e"))
        .select($"e.doc_a".as("a"), $"e.doc_b".as("b"))
        .localCheckpoint()
      var m = withoutOriginStats(edges0.groupBy($"a".as("doc"))
        .agg(min(least($"a", $"b")).as("label")).localCheckpoint())
      // contracted rep graph
      var eg = withoutOriginStats(edges0
        .join(m.select($"doc".as("a"), $"label".as("la")), Seq("a"))
        .join(m.select($"doc".as("b"), $"label".as("lb")), Seq("b"))
        .filter($"la" =!= $"lb")
        .select(least($"la", $"lb").as("a"), greatest($"la", $"lb").as("b"))
        .distinct().localCheckpoint())
      var rounds = 0
      while (eg.limit(1).count() > 0 && rounds < 50) {
        // one min-label round over the contracted graph (both directions)
        val l0 = eg
          .select(explode(array(struct($"a", $"b"),
            struct($"b".as("a"), $"a".as("b")))).as("e"))
          .select($"e.a".as("doc"), $"e.b".as("nb"))
          .groupBy($"doc").agg(min(least($"doc", $"nb")).as("label"))
        // pointer-jump l to l^4 (handles the ordered-id chain case
        // where contraction shrinks by a constant per round)
        val l = withoutOriginStats(l0.as("l1")
          .join(l0.as("l2"), col("l1.label") === col("l2.doc"), "left")
          .join(l0.as("l3"), col("l2.label") === col("l3.doc"), "left")
          .select(col("l1.doc").as("doc"),
            coalesce(col("l3.label"), col("l2.label"), col("l1.label"))
              .as("label"))
          .localCheckpoint())
        // compose: m(v) := l(m(v)) where defined
        m = withoutOriginStats(m.join(
            l.select($"doc".as("label"), $"label".as("l2")), Seq("label"), "left")
          .select($"doc", coalesce($"l2", $"label").as("label"))
          .localCheckpoint())
        // contract the rep graph
        eg = withoutOriginStats(eg
          .join(l.select($"doc".as("a"), $"label".as("la")), Seq("a"), "left")
          .join(l.select($"doc".as("b"), $"label".as("lb")), Seq("b"), "left")
          .select(coalesce($"la", $"a").as("na"), coalesce($"lb", $"b").as("nb"))
          .filter($"na" =!= $"nb")
          .select(least($"na", $"nb").as("a"), greatest($"na", $"nb").as("b"))
          .distinct().localCheckpoint())
        rounds += 1
      }
      (m, rounds)
    }
    // hybrid2: production loop + rep-level neighbor pooling (one
    // edge-volume join per round, accumulated jump arm kept)
    def ccHybrid(pairs: DataFrame): (DataFrame, Int) = {
      import org.apache.spark.sql.graft.CheckpointBridge.withoutOriginStats
      val edges = withoutOriginStats(pairs
        .select(explode(array(
          struct($"doc_a", $"doc_b"),
          struct($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))).as("e"))
        .select($"e.doc_a", $"e.doc_b")
        .repartition($"doc_b").sortWithinPartitions($"doc_b")
        .localCheckpoint())
      var labels = withoutOriginStats(edges.groupBy($"doc_a".as("doc"))
        .agg(min(least($"doc_a", $"doc_b")).as("label")).localCheckpoint())
      var converged = false
      var rounds = 0
      while (!converged && rounds < 50) {
        val nv = edges.join(labels, $"doc_b" === $"doc")
          .groupBy($"doc_a").agg(min($"label").as("nvmin"))
        val repMin = labels.join(nv, $"doc" === $"doc_a")
          .groupBy($"label".as("rep")).agg(min($"nvmin").as("nbmin"))
        val viaRep = labels.join(repMin, $"label" === $"rep")
          .select($"doc", $"nbmin".as("label"),
            when(lit(false), $"nbmin").as("prev"))
        val viaJump = labels.as("l1")
          .join(labels.as("l2"), col("l1.label") === col("l2.doc"))
          .join(labels.as("l3"), col("l2.label") === col("l3.doc"))
          .join(labels.as("l4"), col("l3.label") === col("l4.doc"))
          .select(col("l1.doc").as("doc"), col("l4.label").as("label"),
            when(lit(false), col("l4.label")).as("prev"))
        val obs = org.apache.spark.sql.Observation(s"cch_$rounds${System.nanoTime()}")
        val next = withoutOriginStats(
          labels.select($"doc", $"label", $"label".as("prev"))
            .unionByName(viaRep)
            .unionByName(viaJump)
            .groupBy($"doc")
            .agg(min($"label").as("label"), min($"prev").as("prev"))
            .observe(obs,
              sum(when($"label" =!= $"prev", 1L).otherwise(0L)).as("changed"))
            .localCheckpoint())
        converged = Option(obs.get("changed")).forall(_.asInstanceOf[Long] == 0L)
        labels = next.select($"doc", $"label")
        rounds += 1
      }
      (labels, rounds)
    }
    if (sections("cchybrid")) {
      val pathInc = spark.range(299).select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
      val perm = spark.range(300)
        .select($"id", pmod(graft.functions.Hashing.md5Long40($"id".cast("string")), lit(1000000L)).as("pid"))
        .localCheckpoint()
      val pathPerm = spark.range(299).select($"id".as("i"), ($"id" + 1).as("j"))
        .join(perm.select($"id".as("i"), $"pid".as("doc_a")), Seq("i"))
        .join(perm.select($"id".as("j"), $"pid".as("doc_b")), Seq("j"))
        .select($"doc_a", $"doc_b").localCheckpoint()
      val e = Tables.embeddings(spark, sfDir)
      val best = ops.SemDedup.bestOf(e).localCheckpoint()
      val x145g = ops.SemDedup.candidatePairsOf(best, Long.MaxValue)
        .filter(graft.functions.Hashing.cosQ(
          graft.functions.Hashing.dotQ(col("x.e"), col("y.e")),
          col("x.nq"), col("y.nq")) >= ops.SemDedup.Tau)
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
        .localCheckpoint()
      for ((name, g) <- Seq("pathInc" -> pathInc, "pathPerm" -> pathPerm,
          "x145" -> x145g)) {
        val t0 = System.nanoTime()
        val (m, r) = ccHybrid(g)
        val nc = m.select($"label").distinct().count()
        println(f"[prof] hybrid $name: rounds=$r comps=$nc wall=${(System.nanoTime() - t0) / 1e9}%.2f")
        val (m2, _) = ops.Dedup.connectedComponentsWithRounds(g)
        val d = m.as("x").join(m2.as("y"), col("x.doc") === col("y.doc"))
          .filter(col("x.label") =!= col("y.label")).count()
        println(s"[prof] hybrid $name: mismatches vs current = $d")
      }
    }
    if (sections("cccontract")) {
      // path graphs: increasing ids (contraction worst case), permuted ids
      val pathInc = spark.range(299).select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
      val perm = spark.range(300)
        .select($"id", pmod(graft.functions.Hashing.md5Long40($"id".cast("string")), lit(1000000L)).as("pid"))
        .localCheckpoint()
      val pathPerm = spark.range(299).select($"id".as("i"), ($"id" + 1).as("j"))
        .join(perm.select($"id".as("i"), $"pid".as("doc_a")), Seq("i"))
        .join(perm.select($"id".as("j"), $"pid".as("doc_b")), Seq("j"))
        .select($"doc_a", $"doc_b").localCheckpoint()
      for ((name, g) <- Seq("pathInc" -> pathInc, "pathPerm" -> pathPerm)) {
        val t0 = System.nanoTime()
        val (m, r) = ccContract(g)
        val nc = m.select($"label").distinct().count()
        println(f"[prof] contract $name: rounds=$r comps=$nc wall=${(System.nanoTime() - t0) / 1e9}%.2f")
        val t1 = System.nanoTime()
        val (m2, r2) = ops.Dedup.connectedComponentsWithRounds(g)
        println(f"[prof] current  $name: rounds=$r2 comps=${m2.select($"label").distinct().count()} wall=${(System.nanoTime() - t1) / 1e9}%.2f")
      }
      // x145 real graph
      val e = Tables.embeddings(spark, sfDir)
      val best = ops.SemDedup.bestOf(e).localCheckpoint()
      val pairs = ops.SemDedup.candidatePairsOf(best, Long.MaxValue)
        .filter(graft.functions.Hashing.cosQ(
          graft.functions.Hashing.dotQ(col("x.e"), col("y.e")),
          col("x.nq"), col("y.nq")) >= ops.SemDedup.Tau)
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
        .localCheckpoint()
      val t0 = System.nanoTime()
      val (m, r) = ccContract(pairs)
      println(f"[prof] contract x145: rounds=$r wall=${(System.nanoTime() - t0) / 1e9}%.2f")
      val t1 = System.nanoTime()
      val (m2, r2) = ops.Dedup.connectedComponentsWithRounds(pairs)
      println(f"[prof] current  x145: rounds=$r2 wall=${(System.nanoTime() - t1) / 1e9}%.2f")
      // result equality
      val d = m.as("x").join(m2.as("y"), col("x.doc") === col("y.doc"))
        .filter(col("x.label") =!= col("y.label")).count()
      println(s"[prof] label mismatches = $d")
    }

    // ---------- x145 pair-graph structure ----------
    if (sections("ccgraph")) {
      val e = Tables.embeddings(spark, sfDir)
      val best = ops.SemDedup.bestOf(e).localCheckpoint()
      val pairs = ops.SemDedup.candidatePairsOf(best, Long.MaxValue)
        .filter(graft.functions.Hashing.cosQ(
          graft.functions.Hashing.dotQ(col("x.e"), col("y.e")),
          col("x.nq"), col("y.nq")) >= ops.SemDedup.Tau)
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
        .localCheckpoint()
      println(s"[prof] x145 graph: edges=${pairs.count()}")
      val (labels, rounds) = ops.Dedup.connectedComponentsWithRounds(pairs)
      println(s"[prof] x145 graph: rounds=$rounds verts=${labels.count()}")
      val comp = labels.groupBy($"label").agg(count(lit(1)).as("n"))
      println(s"[prof] x145 graph: components=${comp.count()} " +
        s"maxsize=${comp.agg(max($"n")).head.getLong(0)}")
    }

    // ---------- floor-band accounting (verdict item 7) ----------
    if (sections("floor")) {
      timeIt("floor: 1-row range, map-only, noop", 21) {
        noop(spark.range(1).selectExpr("id"))
      }
      timeIt("floor: parquet scan+filter (events), map-only", 11) {
        noop(Tables.events(spark, sfDir).filter($"event_type" === "view")
          .select($"event_id"))
      }
      timeIt("floor: 2-exchange agg + global sort (events)", 11) {
        noop(Tables.events(spark, sfDir)
          .groupBy($"event_type").agg(count(lit(1)).as("n"))
          .orderBy($"event_type"))
      }
    }

    // ---------- x145 staged attribution at sf0.1 ----------
    if (sections("x145")) {
      val e = Tables.embeddings(spark, sfDir)
      val cap = ops.ScaleCaps.maxCellSize
      timeIt("x145 bestOf (no ckpt) noop") { noop(ops.SemDedup.bestOf(e)) }
      timeIt("x145 bestOf ckpt build") {
        ops.SemDedup.bestOf(e).localCheckpoint()
      }
      val best = ops.SemDedup.bestOf(e).localCheckpoint()
      val pairs = ops.SemDedup.candidatePairsOf(best, cap)
        .filter(graft.functions.Hashing.cosQ(
          graft.functions.Hashing.dotQ(col("x.e"), col("y.e")),
          col("x.nq"), col("y.nq")) >= ops.SemDedup.Tau)
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
      timeIt("x145 pair join + threshold (from ckpt best)") { noop(pairs) }
      var lastRounds = -1
      timeIt("x145 CC (from materialized pairs)") {
        val p = pairs.localCheckpoint()
        val (labels, rounds) = ops.Dedup.connectedComponentsWithRounds(p)
        lastRounds = rounds
        noop(labels)
      }
      println(s"[prof] x145 CC rounds @1x = $lastRounds")
      timeIt("x145 full query") { noop(ops.SemDedup.semOf(e, cap)) }
    }

    // ---------- x145 at 30x (capped cell 200) ----------
    if (sections("x145x30")) {
      val path = "target/cand_growth/emb_x30/embeddings.parquet"
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) {
        Tables.embeddings(spark, sfDir)
          .crossJoin(spark.range(30).toDF("block"))
          .select(($"vec_id" + $"block" * 10000000L).as("vec_id"),
            $"embedding", $"label")
          .repartition(240)
          .write.mode("overwrite").parquet(path)
      }
      val e30 = spark.read.parquet(path)
      val CellCap = 200L
      timeIt("x145@30x bestOf ckpt build", 3) {
        ops.SemDedup.bestOf(e30).localCheckpoint()
      }
      val best = ops.SemDedup.bestOf(e30).localCheckpoint()
      val pairs = ops.SemDedup.candidatePairsOf(best, CellCap)
        .filter(graft.functions.Hashing.cosQ(
          graft.functions.Hashing.dotQ(col("x.e"), col("y.e")),
          col("x.nq"), col("y.nq")) >= ops.SemDedup.Tau)
        .select(col("x.vec_id").as("doc_a"), col("y.vec_id").as("doc_b"))
      timeIt("x145@30x pair join + threshold", 3) { noop(pairs) }
      println(s"[prof] x145@30x pair count = ${pairs.count()}")
      var lastRounds = -1
      timeIt("x145@30x CC (from materialized pairs)", 3) {
        val p = pairs.localCheckpoint()
        val (labels, rounds) = ops.Dedup.connectedComponentsWithRounds(p)
        lastRounds = rounds
        noop(labels)
      }
      println(s"[prof] x145@30x CC rounds = $lastRounds")
      timeIt("x145@30x full query (capped 200)", 3) {
        noop(ops.SemDedup.semOf(e30, CellCap))
      }
    }
    spark.stop()
  }
}
