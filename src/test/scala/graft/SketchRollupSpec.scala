package graft

import java.security.MessageDigest

import graft.ops.SketchRollup

/** X138 — KMV sketch rollup: the merge law as an engine-side identity
  * (merged-from-fine-sketches ≡ direct-at-grain, bit-for-bit),
  * losslessness below capacity, cross-group hash dedup in the merge,
  * partition-count invariance, and the exact driver-side replay of
  * every grain on the real corpus.
  */
class SketchRollupSpec extends SparkSpec {

  import spark.implicits._

  private val K = SketchRollup.K
  private val H = SketchRollup.H

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getAs[String]("level"), r.getAs[String]("key")) -> r).toMap

  test("X138: merged-from-fine-sketches equals direct-at-grain") {
    val items = SketchRollup.itemsOf(spark, sfDir)
    val merged = SketchRollup.rollupOf(items)
      .select("level", "key", "k_used", "kth_hash", "est_q")
      .collect().map(_.toString).sorted.toSeq
    // direct path: KMV per grain over the FULL item stream — what a
    // rescan at each grain would compute
    val direct = {
      import org.apache.spark.sql.functions._
      val lv = items.select(lit("source").as("level"),
          $"source".as("key"), $"h")
        .unionByName(items.select(lit("lang").as("level"),
          $"lang".as("key"), $"h"))
        .unionByName(items.select(lit("all").as("level"),
          lit("all").as("key"), $"h"))
        .distinct()
      SketchRollup.kmvPerKey(lv)
        .select("level", "key", "k_used", "kth_hash", "est_q")
        .collect().map(_.toString).sorted.toSeq
    }
    assert(merged == direct,
      "bottom-k merge of fine sketches must equal a direct pass")
  }

  test("X138: below capacity every level reports exactly") {
    // 3 fine groups, ≤ 5 hashes each, some shared across groups —
    // every union far below K = 16
    val items = Seq(
      ("s1", "en", 10L), ("s1", "en", 11L), ("s1", "de", 11L),
      ("s1", "de", 12L), ("s2", "en", 10L), ("s2", "en", 20L),
      ("s2", "en", 21L)).toDF("source", "lang", "h").distinct()
    val got = rows(SketchRollup.rollupOf(items))
    // source s1: {10,11,12}; s2: {10,20,21}; lang en: {10,11,20,21};
    // de: {11,12}; all: {10,11,12,20,21}
    val want = Map(
      ("source", "s1") -> 3L, ("source", "s2") -> 3L,
      ("lang", "en") -> 4L, ("lang", "de") -> 2L,
      ("all", "all") -> 5L)
    assert(got.keySet == want.keySet)
    want.foreach { case (k, n) =>
      assert(got(k).getAs[Long]("n_distinct") == n, s"$k n_distinct")
      assert(got(k).getAs[Long]("k_used") == n, s"$k k_used")
      assert(got(k).getAs[Double]("est_q") == n.toDouble,
        s"$k est must be exact below capacity")
    }
  }

  test("X138: shared hashes dedup in the merge, not double-count") {
    // two langs of one source with a fully shared 20-hash set: the
    // source-level union must be 20, not 40, and its sketch the same
    // bottom-16 as either member's
    val items = ((1L to 20L).map(h => ("s", "en", h * 7)) ++
      (1L to 20L).map(h => ("s", "de", h * 7)))
      .toDF("source", "lang", "h").distinct()
    val got = rows(SketchRollup.rollupOf(items))
    val src = got(("source", "s"))
    assert(src.getAs[Long]("n_distinct") == 20L)
    assert(src.getAs[Long]("k_used") == K.toLong)
    assert(src.getAs[Long]("kth_hash") == 16L * 7)
    assert(src.getAs[Double]("est_q") ==
      (K - 1).toDouble * H.toDouble / (16.0 * 7))
  }

  test("X138: partition-count invariance") {
    val items = SketchRollup.itemsOf(spark, sfDir)
    val one = SketchRollup.rollupOf(items).collect().map(_.toString).toSeq
    val seven = SketchRollup.rollupOf(items.repartition(7))
      .collect().map(_.toString).toSeq
    assert(one == seven)
  }

  test("X138: real corpus equals the exact driver-side replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1),
        md5Long40Ref(r.getString(2))))
    val grains: Map[(String, String), Set[Long]] =
      docs.groupBy(d => ("source", d._1)).map { case (k, g) =>
        k -> g.map(_._3).toSet } ++
      docs.groupBy(d => ("lang", d._2)).map { case (k, g) =>
        k -> g.map(_._3).toSet } ++
      Map(("all", "all") -> docs.map(_._3).toSet)
    val got = rows(SketchRollup.sketchRollup(spark, sfDir))
    assert(got.keySet == grains.keySet)
    grains.foreach { case (k, hs) =>
      val sorted = hs.toSeq.sorted
      val kUsed = math.min(K, sorted.size).toLong
      val kth = sorted(kUsed.toInt - 1)
      val est = if (kUsed < K) kUsed.toDouble
        else (K - 1).toDouble * H.toDouble / kth.toDouble
      val r = got(k)
      assert(r.getAs[Long]("n_distinct") == hs.size.toLong,
        s"$k n_distinct")
      assert(r.getAs[Long]("k_used") == kUsed, s"$k k_used")
      assert(r.getAs[Long]("kth_hash") == kth, s"$k kth_hash")
      assert(r.getAs[Double]("est_q") == est, s"$k est_q")
    }
  }
}
