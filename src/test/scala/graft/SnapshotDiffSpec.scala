package graft

import graft.ops.SnapshotDiff

/** X77 — corpus snapshot diff: classes must match a driver-side replay
  * of the deterministic snapshot rules, totals must conserve both
  * snapshots, and the diff must plan a doc_id-keyed join with no
  * cartesian and no window.
  */
class SnapshotDiffSpec extends SparkSpec {

  private def h(docId: Long, salt: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId$salt".getBytes("UTF-8"))
    // md5Long40: low 40 bits of the little-endian tail — mirror via the
    // builtin-composition definition: last 5 hex bytes reversed
    val hex = md.map("%02x".format(_)).mkString
    java.lang.Long.parseLong(
      hex.slice(24, 26) + hex.slice(22, 24) + hex.slice(20, 22) +
        hex.slice(18, 20) + hex.slice(16, 18), 16)
  }

  test("X77: classes equal a driver-side replay of the snapshot rules") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source")))
    val want = collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    docs.foreach { case (id, src) =>
      if (h(id, ":rm") % 20 == 0) want((src, "removed")) += 1
      else if (h(id, ":chg") % 10 == 0) want((src, "changed")) += 1
      else want((src, "unchanged")) += 1
      if (h(id, ":add") % 25 == 0) want((src, "added")) += 1
    }
    val got = SnapshotDiff.snapshotDiff(spark, sfDir).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("change_class"))
        -> r.getAs[Long]("n_docs")).toMap
    assert(got.nonEmpty && got == want.toMap,
      s"diff mismatch:\n got  $got\n want ${want.toMap}")
  }

  test("X77: conservation — classes cover both snapshots exactly") {
    val rows = SnapshotDiff.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getAs[String]("change_class") -> r.getAs[Long]("n_docs"))
    val by = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nA = Tables.documents(spark, sfDir).count()
    // snapshot A = removed + changed + unchanged; B = added + changed + unchanged
    assert(by.getOrElse("removed", 0L) + by.getOrElse("changed", 0L) +
      by.getOrElse("unchanged", 0L) == nA)
    assert(Seq("added", "removed", "changed", "unchanged")
      .forall(c => by.getOrElse(c, 0L) > 0L),
      s"fixture must exercise all four classes: $by")
  }

  test("X77: doc-keyed outer join plan — no cartesian, no window") {
    val plan = SnapshotDiff.snapshotDiff(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"diff must be a full outer join:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    assert(!plan.contains("Window"), s"no window:\n$plan")
  }
}
