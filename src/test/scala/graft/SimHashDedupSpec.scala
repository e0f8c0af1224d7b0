package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, SimHashDedup}

/** X32 — SimHash Hamming near-dup join. The load-bearing claim is the
  * PIGEONHOLE equality: the banded candidate plan must return exactly
  * the brute-force all-pairs set at Hamming ≤ Bands − 1 (4 disjoint
  * bands cannot all be touched by ≤ 3 differing bits). The driver's
  * oracle re-proves this vs DuckDB; here it is pinned vs an in-test
  * brute force over the real corpus, plus the plan properties that keep
  * it scale-safe.
  */
class SimHashDedupSpec extends SparkSpec {

  private def shingles = Dedup.shinglesOf(Tables.documents(spark, sfDir))

  test("X32: banded join equals brute-force Hamming <= 3 on the corpus") {
    val got = SimHashDedup.nearDupOf(shingles)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming"))).toSet
    // brute force on the driver over the collected fingerprints (the
    // corpus is tiny at sf0.001; fingerprints are one long per doc)
    val sims = SimHashDedup.fingerprintsOf(shingles)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("sim")))
    val want = (for {
      (da, sa) <- sims; (db, sb) <- sims if da < db
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= SimHashDedup.MaxHamming
    } yield (da, db, h.toLong)).toSet
    assert(want.nonEmpty, "corpus should contain at least one near-dup pair")
    assert(got == want,
      s"banded plan lost or invented pairs:\nmissing=${want -- got}\nextra=${got -- want}")
  }

  test("X32: fingerprints use all 60 bits and short docs have none") {
    val sims = SimHashDedup.fingerprintsOf(shingles).collect()
      .map(_.getAs[Long]("sim"))
    assert(sims.forall(s => s >= 0L && s < (1L << 60)))
    // the high band (bits 45..59, from the second hash) must actually
    // vary — a regression here would silently weaken banding to 40 bits
    assert(sims.map(_ >> 45).distinct.length > 1,
      "high-band bits are constant: second hash not wired in")
    import spark.implicits._
    val tiny = Seq((1L, "too short"), (2L, "also just two")).toDF("doc_id", "text")
    assert(SimHashDedup.nearDupOf(Dedup.shinglesOf(tiny)).count() == 0L)
  }

  test("X32: candidates come from the banded equi-join, never all-pairs") {
    val plan = SimHashDedup.simhashNearDup(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"all-pairs join in the plan:\n$plan")
    // the candidate join must be keyed on the band columns
    assert(plan.contains("band"), s"band key missing from the join:\n$plan")
    // the fingerprint build feeds both join sides from one materialized
    // copy (localCheckpoint since round 16 — an RDD scan, not a cache)
    assert(plan.contains("Scan ExistingRDD"),
      s"fingerprint subplan not shared across the self-join:\n$plan")
  }
}
