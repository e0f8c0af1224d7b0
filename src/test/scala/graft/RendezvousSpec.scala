package graft

import graft.ops.Rendezvous

/** X108 — rendezvous re-shard audit: the HRW stability property pinned
  * structurally (movement ONLY to the added shard), a driver-side exact
  * replay of the assignment, and the movement-fraction sanity band.
  */
class RendezvousSpec extends SparkSpec {

  import spark.implicits._

  /** Portable 40-bit md5, mirroring Hashing.md5Long40 driver-side. */
  private def md5l40(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    (d(8).toLong & 0xffL) | ((d(9).toLong & 0xffL) << 8) |
      ((d(10).toLong & 0xffL) << 16) | ((d(11).toLong & 0xffL) << 24) |
      ((d(12).toLong & 0xffL) << 32)
  }

  private def assign(docId: Long, n: Int): Long =
    (0 until n).maxBy(s => (md5l40(s"x108|$s|$docId"), -s)).toLong

  test("X108: movement only ever targets the ADDED shard (HRW stability)") {
    val out = Rendezvous.reshardAudit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // every off-diagonal transition lands on the new shard NNew-1
    out.filter { case (o, n, _) => o != n }.foreach { case (o, n, c) =>
      assert(n == Rendezvous.NNew - 1,
        s"illegal transition $o -> $n ($c docs): HRW may only move to the added shard")
    }
    // and the added shard gained SOMETHING (fixture guard)
    assert(out.exists { case (o, n, _) => o != n && n == Rendezvous.NNew - 1 })
  }

  test("X108: transition matrix equals the exact driver-side replay") {
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val expected = ids.map(id =>
      (assign(id, Rendezvous.NOld), assign(id, Rendezvous.NNew)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Rendezvous.reshardAudit(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // moved mass ~ 1/NNew of the corpus: generous 3x band, it is a
    // hash-uniformity sanity check, not a distributional assertion
    val moved = expected.collect { case ((o, n), c) if o != n => c }.sum
    val frac = moved.toDouble / ids.length
    assert(frac > 0.0 && frac < 3.0 / Rendezvous.NNew,
      s"moved fraction $frac outside sanity band")
  }
}
