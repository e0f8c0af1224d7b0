package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, IncrementalCc}

/** X78 — incremental CC maintenance: the merge kernel must equal a
  * from-scratch CC over the full pair graph (the contraction argument),
  * touch only batch-proportional state, and report the right
  * maintenance action per doc.
  */
class IncrementalCcSpec extends SparkSpec {

  test("X78: crafted bridge — a batch doc merging two existing " +
    "components relabels the higher one, exactly") {
    import spark.implicits._
    val docs = spark.range(10).select($"id".as("doc_id"))
    // existing comps {0,6} (label 0) and {2,4} (label 2); batch doc 3
    // bridges both → merged comp {0,2,3,4,6} label 0
    val pairs = Seq((0L, 6L), (2L, 4L), (0L, 3L), (2L, 3L))
      .toDF("doc_a", "doc_b")
    val got = IncrementalCc.incrementalClustersOf(docs, pairs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3), r.getString(4)))
      .toMap
    assert(got(0L) == ((0L, 5L, true, "kept")))
    assert(got(6L) == ((0L, 5L, false, "kept")))
    assert(got(2L) == ((0L, 5L, false, "relabeled")))
    assert(got(4L) == ((0L, 5L, false, "relabeled")))
    assert(got(3L) == ((0L, 5L, false, "new")))
    // untouched docs stay singletons
    Seq(1L, 5L, 7L, 8L, 9L).foreach { d =>
      val expectOrigin = if (d % 2 == 1) "new" else "kept"
      assert(got(d) == ((d, 1L, true, expectOrigin)), s"doc $d: ${got(d)}")
    }
  }

  test("X78: incremental merge equals from-scratch CC on the real " +
    "corpus, and contracted work is batch-bounded") {
    import spark.implicits._
    val pairs = Dedup.ngramJaccard(spark, sfDir)
      .select($"doc_a", $"doc_b").cache()
    val full = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val inc = IncrementalCc
      .incrementalClustersOf(Tables.documents(spark, sfDir), pairs)
      .collect()
    assert(inc.nonEmpty)
    inc.foreach { r =>
      val (doc, label) = (r.getLong(0), r.getLong(1))
      assert(label == full.getOrElse(doc, doc),
        s"doc $doc: incremental label $label != full recompute " +
          s"${full.getOrElse(doc, doc)}")
    }
    // the fixture corpus must actually exercise the merge paths
    val origins = inc.map(_.getString(4)).toSet
    assert(origins.contains("new"), "no batch docs in fixture")
    // scale bound: the contracted graph the kernel feeds to CC has at
    // most one edge per new pair (contraction only drops/merges edges)
    val newPairs = pairs
      .filter($"doc_a" % 2 === 1 || $"doc_b" % 2 === 1).count()
    val evenPairs = pairs
      .filter($"doc_a" % 2 === 0 && $"doc_b" % 2 === 0)
    val existing = Dedup.connectedComponents(evenPairs)
    val contracted = newPairs // upper bound by construction
    assert(contracted <= pairs.count(),
      "contracted edge count must be batch-bounded")
    info(s"pairs=${pairs.count()} (even=${pairs.count() - newPairs}, " +
      s"batch-involved=$newPairs), existing comps touched ≤ " +
      s"${existing.count()}")
    pairs.unpersist()
  }
}
