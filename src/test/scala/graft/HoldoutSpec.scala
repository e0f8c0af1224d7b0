package graft

import java.security.MessageDigest

import graft.ops.Holdout

/** X128 — coordinated holdout: the zero-flip guarantee on the real
  * corpus, the overlap decomposition identities, and an exact
  * driver-side replay of both snapshots' membership.
  */
class HoldoutSpec extends SparkSpec {

  private def md5Long40Ref(s: String): Long = {
    val d = MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    (0 until 5).map(i => (d(8 + i).toLong & 0xffL) << (8 * i)).sum
  }

  private def isHold(id: Long): Boolean =
    md5Long40Ref(s"$id:holdout") % Holdout.Mod == 0

  private def rowOf(df: org.apache.spark.sql.DataFrame) = {
    val r = df.collect().head
    (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("hold_a"),
      r.getAs[Long]("hold_b"), r.getAs[Long]("hold_both"),
      r.getAs[Long]("hold_removed"), r.getAs[Long]("hold_added"),
      r.getAs[Long]("hold_flips"))
  }

  test("X128: membership flips are exactly zero and overlaps decompose") {
    val (nA, nB, hA, hB, both, removed, added, flips) =
      rowOf(Holdout.coordinatedHoldout(spark, sfDir))
    assert(flips == 0L) // the coordination guarantee, proven on data
    assert(hA == both + removed) // A's holdout partitions cleanly
    assert(hB == both + added)   // so does B's
    assert(hA > 0 && hB > 0)     // a 1-in-16 rule does fire
    assert(nA > 0 && nB > 0)
  }

  test("X128: real corpus equals the exact driver replay") {
    val ids = Tables.documents(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0))
    // replay snapshot B's id population (SnapshotDiff.snapshotB rule)
    val keptIds = ids.filter(id => md5Long40Ref(s"$id:rm") % 20 != 0)
    val addedIds = ids.filter(id => md5Long40Ref(s"$id:add") % 25 == 0)
      .map(_ + 1000000000L)
    val bIds = keptIds ++ addedIds
    val hA = ids.filter(isHold).toSet
    val hB = bIds.filter(isHold).toSet
    val expected = (ids.length.toLong, bIds.length.toLong,
      hA.size.toLong, hB.size.toLong, (hA intersect hB).size.toLong,
      (hA diff hB).size.toLong, (hB diff hA).size.toLong, 0L)
    assert(rowOf(Holdout.coordinatedHoldout(spark, sfDir)) == expected)
  }
}
