package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Text}

/** Near-dup and exact-dedup behavior on synthetic corpora (the oracle
  * checks engine parity on the real tables; these check the *semantics*
  * on controlled inputs): dedup idempotence, planted near-duplicates
  * found, disjoint documents not paired.
  */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "'en' AS lang", "'src' AS source", "text")
  }

  test("X1: exact dedup keeps the lowest doc_id per normalized text") {
    val d = docs(
      1L -> "The quick brown fox",
      2L -> "  the QUICK brown fox  ", // same after lower+trim
      3L -> "a different document")
    val out = Text.exactDedupDocs(d).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  test("X1: dedup is idempotent") {
    val d = docs(1L -> "alpha beta gamma", 2L -> "alpha beta gamma", 3L -> "delta")
    val once = Text.exactDedupDocs(d)
    val twice = Text.exactDedupDocs(
      once.join(d.select("doc_id", "text"), "doc_id")
        .select("doc_id", "lang", "source", "text"))
    assert(once.select("doc_id").collect().toSeq ==
      twice.select("doc_id").collect().toSeq)
  }

  test("X2: planted near-duplicates are found with high jaccard; disjoint docs are not paired") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 20) "CHANGED" else s"tok$i").mkString(" ")
    val disjoint = (1 to 40).map(i => s"other$i").mkString(" ")
    val pairs = Dedup.minhashPairs(Dedup.shinglesOf(docs(
      1L -> base, 2L -> nearDup, 3L -> disjoint))).collect()
    assert(pairs.length == 1, s"expected exactly the planted pair, got ${pairs.toSeq}")
    val p = pairs(0)
    assert(p.getAs[Long]("doc_a") == 1L && p.getAs[Long]("doc_b") == 2L)
    val jac = p.getAs[Double]("jaccard")
    // one changed token breaks 3 of 38 shingles → jaccard = 35/41 ≈ 0.85
    assert(jac > 0.6 && jac < 1.0, s"unexpected jaccard $jac")
  }

  test("X2: identical documents get jaccard 1.0") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val pairs = Dedup.minhashPairs(Dedup.shinglesOf(docs(1L -> t, 2L -> t))).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getAs[Double]("jaccard") == 1.0)
  }

  test("connected components: chains merge transitively, min id labels the cluster") {
    import spark.implicits._
    // chain 5-3, 3-9 plus isolated pair 20-21 → components {3,5,9}, {20,21}
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L))
  }

  test("connected components: randomized graphs match a union-find oracle") {
    import spark.implicits._
    // seeded graphs with deliberately long paths: near-dup components are
    // cliques (diameter 1), so random graphs + explicit paths are what
    // actually stress the loop's multi-round convergence
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val nVerts = 30 + trial * 10
      val random = Seq.fill(40)((rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter { case (a, b) => a != b }
      // a 12-vertex path on ids far above the random block (diameter 11)
      val path = (0 until 11).map(i => (1000L + i, 1001L + i))
      val edges = random ++ path
      // oracle: plain union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) => parent(find(a)) = find(b) }
      val verts = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = {
        val byRoot = verts.groupBy(find)
        verts.map(v => v -> byRoot(find(v)).min).toMap
      }
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: CC labels diverge from union-find")
    }
  }

  test("connected components: permuted-id long path converges to ONE component") {
    import spark.implicits._
    // The round-18 arms' adversarial layout (found round 19): a
    // high-diameter path whose vertex ids are UNCORRELATED with path
    // position. Per-vertex propagation needs O(diameter) rounds and
    // pointer jumps chase ball-minima rather than the frontier, so the
    // old loop exhausted its 50-round cap and silently returned a
    // 2-component labeling of a connected graph. The rep-pooled
    // neighbor arm must converge it well inside the cap, to one
    // component labeled by the global min.
    val rnd = new scala.util.Random(7)
    val ids = rnd.shuffle((0L until 300L).toVector)
    val edges = (0 until 299).map(i => (ids(i), ids(i + 1)))
    val (labels, rounds) =
      Dedup.connectedComponentsWithRounds(edges.toDF("doc_a", "doc_b"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 300)
    assert(got.map(_._2).distinct.toSeq == Seq(0L),
      "a connected path must form exactly one component rooted at id 0")
    assert(rounds <= 15, s"convergence took $rounds rounds — the " +
      "rep-pooling acceleration has regressed")
  }

  test("connected components: empty edge list terminates with no labels") {
    import spark.implicits._
    val none = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    // the observed changed-count over zero vertices is null — must read
    // as converged, not loop or throw
    assert(Dedup.connectedComponents(none).isEmpty)
  }

  test("fingerprint sketch: k smallest hashes, equal docs share sketches") {
    val t = (1 to 30).map(i => s"w$i").mkString(" ")
    val sk = Dedup.shinglesOf(docs(1L -> t, 2L -> t))
      .select(col("doc_id"), graft.functions.Hashing.md5Long40(col("sh")).as("h"))
      .groupBy("doc_id")
      .agg(slice(array_sort(collect_list(col("h"))), 1, 4).as("sketch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1))
    assert(sk.length == 2)
    assert(sk(0)._2 == sk(1)._2, "identical docs must share the k-min sketch")
    assert(sk(0)._2.length == 4)
    assert(sk(0)._2 == sk(0)._2.sorted)
  }

  test("X75: degree histogram equals a replay from the x02 pair stream") {
    val pairs = Dedup.minhashLsh(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val nDocs = Tables.documents(spark, sfDir).count()
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val histo = (deg.values.toSeq ++
      Seq.fill((nDocs - deg.size).toInt)(0L))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Dedup.dupDegreeHistogram(spark, sfDir).collect()
      .map(r => r.getAs[Long]("degree") -> r.getAs[Long]("n_docs")).toMap
    assert(got == histo, s"histogram mismatch: got $got want $histo")
    // conservation: bars cover the corpus; edge endpoints are counted twice
    assert(got.values.sum == nDocs)
    assert(got.map { case (d, n) => d * n }.sum == 2L * pairs.length)
  }

  test("X75: histogram plan partial-aggregates, no window") {
    val plan = Dedup.dupDegreeHistogram(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"no window in the histogram plan:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial"),
      s"degree and histogram counts must merge map-side:\n$plan")
  }
}
