package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.{IndexAlias, IndexStore, IndexVersions, LloydIvfPq}

/** X184 — serving-alias atomic cutover: the registered query flips the
  * alias to the version the staleness audit calls for and probes
  * through it; the swap is atomic (a concurrent reader sees exactly one
  * complete alias, never a torn one); rollback restores v1 bit-for-bit;
  * and the artifact-root ensure protocol survives a two-writer race
  * with no .tmp leak (round-16 advice item 1 + verdict item 8).
  */
class IndexAliasSpec extends SparkSpec {

  import spark.implicits._

  test("X184: registered query cuts over to v2 (the drift batch " +
    "alarms) and serves the retrained index through the alias") {
    val rows = SparkEntry.queries("x184_index_alias_probe")(spark, sfDir)
    assert(rows.columns.toSeq ==
      Seq("serving", "query_id", "rnk", "vec_id", "cos_sim"))
    val collected = rows.collect()
    assert(collected.nonEmpty &&
      collected.forall(_.getAs[String]("serving") == "v2"),
      "the registered ×2-drift batch alarms in every cell — the " +
        "deterministic cutover outcome is v2")
    // the served rows are exactly the retrained index's probe
    val v2 = LloydIvfPq.probe(IndexVersions.retrainedIndex(spark, sfDir))
      .select($"query_id", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toString).toSeq.sorted
    assert(rows.select($"query_id", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toString).toSeq.sorted == v2)
    // and the alias on disk names v2 with a live artifact root
    val a = IndexAlias.readAlias(IndexAlias.aliasPath(sfDir))
    assert(a.version == "v2")
    assert(Files.exists(Paths.get(a.root, "encoded")))
  }

  test("X184: a silent audit keeps v1 serving — the no-swap path " +
    "equals the shipped x178 probe bit-for-bit") {
    val corpus = Tables.embeddings(spark, sfDir)
      .select($"vec_id", $"embedding")
    // the corpus audited against its own artifact is ratio ≡ 1.0
    // exactly (x182's fixpoint law): no alarm, no swap
    val served = IndexAlias.aliasProbeOf(spark, sfDir, corpus)
    val rows = served.collect()
    assert(rows.forall(_.getAs[String]("serving") == "v1"))
    val shipped = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served.select($"query_id", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toString).toSeq == shipped)
  }

  test("X184: rollback after a cutover restores the v1 probe " +
    "bit-for-bit — the old artifact was never touched") {
    // cut over to v2 first (registered path), then roll back
    SparkEntry.queries("x184_index_alias_probe")(spark, sfDir).collect()
    assert(IndexAlias.readAlias(IndexAlias.aliasPath(sfDir)).version == "v2")
    IndexAlias.rollback(spark, sfDir)
    val a = IndexAlias.readAlias(IndexAlias.aliasPath(sfDir))
    assert(a.version == "v1")
    val served = IndexAlias.probeThroughAlias(spark, sfDir)
      .select($"query_id", $"rnk", $"vec_id", $"cos_sim")
      .collect().map(_.toString).toSeq
    val shipped = SparkEntry.queries("x178_ivfpq_topk")(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(served == shipped,
      "rollback must serve the shipped index exactly — not a rebuild")
  }

  test("X184: the alias flip is atomic — a hammering reader never " +
    "observes a torn or half-written alias") {
    val path = Paths.get("target/index_alias_spec/hammer.serving")
    val a = IndexAlias.Serving("v1", "rootA")
    val b = IndexAlias.Serving("v2", "rootB")
    IndexAlias.writeAlias(path, a)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val reads = new java.util.concurrent.atomic.AtomicLong(0)
    val reader = new Thread(() => {
      while (!stop.get()) {
        try {
          val s = IndexAlias.readAlias(path)
          if (s != a && s != b) torn.set(s.toString)
          reads.incrementAndGet()
        } catch { case e: Throwable => torn.set(e.toString); stop.set(true) }
      }
    })
    reader.start()
    (1 to 500).foreach { i =>
      IndexAlias.writeAlias(path, if (i % 2 == 0) a else b)
    }
    stop.set(true)
    reader.join(10000)
    assert(torn.get() == null,
      s"reader observed a torn alias: ${torn.get()}")
    assert(reads.get() > 0, "the reader must actually have raced the flips")
    // and the flip leaves no temp files behind
    val leftovers = Files.list(path.getParent).iterator()
    val tmps = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) {
      val f = leftovers.next().getFileName.toString
      if (f.contains(".tmp-")) tmps += f
    }
    assert(tmps.isEmpty, s"alias flips leaked temp files: $tmps")
  }

  test("X184/X179: two writers racing ensureAt on one fresh root both " +
    "complete, the artifact is whole, and no .tmp directory leaks " +
    "while a concurrent reader probes the other version undisturbed") {
    val built = LloydIvfPq.ivfPqIndex(spark, sfDir)
    val expected = LloydIvfPq.probe(built).collect().map(_.toString).toSeq
    val root = "target/index_alias_spec/race_root_" +
      java.util.UUID.randomUUID().toString.take(8)
    // the reader keeps probing the ALREADY-SERVING v1 artifact while
    // the writers land the new root next to it (the X184 scenario:
    // probing v1 while tonight's v2 build renames into place)
    val v1Root = IndexStore.ensureRoot(spark, sfDir)
    val readerFailed = new java.util.concurrent.atomic.AtomicReference[String](null)
    val readerDone = new java.util.concurrent.CountDownLatch(1)
    val reader = new Thread(() => {
      try {
        val got = LloydIvfPq.probe(IndexStore.readIvfPq(spark, v1Root))
          .collect().map(_.toString).toSeq
        if (got != expected) readerFailed.set("v1 probe changed under race")
      } catch { case e: Throwable => readerFailed.set(e.toString) }
      finally readerDone.countDown()
    })
    val errs = new java.util.concurrent.atomic.AtomicReference[String](null)
    val writers = (1 to 2).map { _ =>
      new Thread(() => {
        try IndexStore.ensureAt(root, () => built)
        catch { case e: Throwable => errs.set(e.toString) }
      })
    }
    reader.start(); writers.foreach(_.start())
    writers.foreach(_.join(120000)); readerDone.await()
    assert(errs.get() == null, s"a racing ensureAt crashed: ${errs.get()}")
    assert(readerFailed.get() == null,
      s"the concurrent v1 reader failed: ${readerFailed.get()}")
    // whichever rename won, the root holds one complete artifact …
    val loaded = LloydIvfPq.probe(IndexStore.readIvfPq(spark, root))
      .collect().map(_.toString).toSeq
    assert(loaded == expected)
    // … and the loser's temp copy is gone (round-16 advice item 1)
    val parent = Paths.get(root).getParent
    val leftovers = Files.list(parent).iterator()
    val tmps = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) {
      val f = leftovers.next().getFileName.toString
      if (f.startsWith(Paths.get(root).getFileName.toString + ".tmp-"))
        tmps += f
    }
    assert(tmps.isEmpty, s"ensureAt leaked temp directories: $tmps")
  }
}
