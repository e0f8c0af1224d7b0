package graft

import graft.ops.FeatureHash

/** X114 — signed feature hashing: determinism/range structure, signed
  * cancellation semantics, corpus-independence of the mapping, and an
  * exact driver-side replay on the real corpus.
  */
class FeatureHashSpec extends SparkSpec {

  import spark.implicits._

  /** Portable 40-bit md5, mirroring Hashing.md5Long40 driver-side. */
  private def md5l40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (d(8).toLong & 0xffL) | ((d(9).toLong & 0xffL) << 8) |
      ((d(10).toLong & 0xffL) << 16) | ((d(11).toLong & 0xffL) << 24) |
      ((d(12).toLong & 0xffL) << 32)
  }

  private def bucketOf(w: String): Long = md5l40(s"x114b|$w") % FeatureHash.Buckets
  private def signOf(w: String): Long = if (md5l40(s"x114s|$w") % 2 == 0) 1L else -1L

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("X114: repeated tokens accumulate; same-bucket opposite signs cancel") {
    // one word repeated 3 times lands 3·sign in its bucket
    val w = "spark"
    val out = rowsOf(FeatureHash.featureHashOf(
      Seq((1L, s"$w $w $w")).toDF("doc_id", "text")))
    assert(out == Map((1L, bucketOf(w)) -> 3 * signOf(w)))
    // find two vocabulary words sharing a bucket with OPPOSITE signs —
    // their doc drops that bucket entirely (the signed-cancellation
    // property that makes collisions unbiased)
    val vocab = ('a' to 'z').flatMap(a => ('a' to 'z').map(b => s"$a$b"))
    val pair = vocab.combinations(2).find { case Seq(u, v) =>
      bucketOf(u) == bucketOf(v) && signOf(u) != signOf(v) }.get
    val cancel = rowsOf(FeatureHash.featureHashOf(
      Seq((2L, pair.mkString(" "))).toDF("doc_id", "text")))
    assert(cancel.isEmpty)
  }

  test("X114: the mapping is corpus-independent (row-local)") {
    // the same doc vectorizes identically alone and amid other docs
    val alone = rowsOf(FeatureHash.featureHashOf(
      Seq((7L, "fast key order sort")).toDF("doc_id", "text")))
    val amid = rowsOf(FeatureHash.featureHashOf(
      Seq((7L, "fast key order sort"), (8L, "completely different words"),
        (9L, "fast fast fast")).toDF("doc_id", "text")))
      .filter(_._1._1 == 7L)
    assert(alone == amid)
  }

  test("X114: real corpus equals the exact replay") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val expected = docs.flatMap { case (id, text) =>
      text.toLowerCase.trim.split("\\s+")
        .map(w => (id, bucketOf(w)) -> signOf(w))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 != 0).toMap
    assert(rowsOf(FeatureHash.featureHash(spark, sfDir)) == expected)
    assert(expected.nonEmpty)
  }
}
