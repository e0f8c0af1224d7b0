package graft

import graft.ops.{Dedup, SplitLeakage, SplitRepair}

/** X66 — split repair: the manifest must cover every document exactly
  * once, drop exactly the train docs with cross-split near-dup links
  * (recomputed driver-side from the X2 pair set), and never touch
  * val/test.
  */
class SplitRepairSpec extends SparkSpec {

  test("X66: manifest equals driver-side recompute from X2 pairs") {
    import spark.implicits._
    val split = Tables.documents(spark, sfDir)
      .select($"doc_id", SplitLeakage.splitOf($"doc_id").as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashLsh(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))

    val links = (pairs.collect {
      case (a, b) if split(a) == "train" && split(b) != "train" => a
    } ++ pairs.collect {
      case (a, b) if split(b) == "train" && split(a) != "train" => b
    }).groupBy(identity).view.mapValues(_.length.toLong).toMap

    val got = SplitRepair.splitRepair(spark, sfDir).collect()
    assert(got.length == split.size, "one manifest row per document")
    assert(got.map(_.getLong(0)).distinct.length == split.size)
    got.foreach { r =>
      val (id, s) = (r.getLong(0), r.getString(1))
      assert(s == split(id), s"split $id")
      assert(r.getLong(2) == links.getOrElse(id, 0L), s"links $id")
      val expectAction =
        if (s == "train" && links.contains(id)) "drop" else "keep"
      assert(r.getString(3) == expectAction, s"action $id")
      if (s != "train") assert(r.getString(3) == "keep",
        s"eval docs never dropped: $id")
    }
    assert(got.exists(_.getString(3) == "drop"),
      "fixture exercises at least one drop")
  }
}
