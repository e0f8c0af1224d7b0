package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops._

/** Partition-count invariance for the third/fourth-wave seams — the
  * measured form of the "deterministic under repartitioning" invariant
  * (SCALE.md): every emitted value, INCLUDING the float columns, must
  * be bit-identical when the input arrives in 7 partitions instead of
  * the session default. Exact-integer construction makes this true by
  * design; this suite is the evidence.
  */
class Wave3InvarianceSpec extends SparkSpec {

  import spark.implicits._

  private def same(name: String, f: DataFrame => DataFrame,
      input: DataFrame): Unit = {
    val a = f(input).collect().toSeq
    val b = f(input.repartition(7)).collect().toSeq
    assert(a == b, s"$name drifted under repartition(7)")
  }

  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val events = Tables.events(spark, sfDir)
  private lazy val emb = Tables.embeddings(spark, sfDir)

  test("X115/X116/X117: profile family is partition-invariant") {
    same("x115", d => Contingency.contingencyOf(
      d.select($"lang".as("a"), $"source".as("b"))), docs)
    same("x116", d => Spearman.lengthBreadthOf(d, col("n_chars")), docs)
    same("x117", d => KsDrift.ksOf(
      d.select($"source".as("grp"), $"n_chars".as("v"))), docs)
  }

  test("X123/X125: graph and fingerprint families are partition-invariant") {
    same("x123", d => Assortativity.assortativityOf(Triangles.edgesOf(d)),
      docs)
    same("x125", d => Winnowing.matchOf(d), docs)
  }

  test("X124/X126/X127/X133: activity family is partition-invariant") {
    same("x124", e => Dispersion.dispersionOf(e), events)
    same("x126", e => InterArrival.cadenceOf(e), events)
    same("x127", e => PathMining.pathTrigramsOf(e), events)
    same("x133", e => LaggedXcorr.xcorrOf(e,
      LaggedXcorr.TypeX, LaggedXcorr.TypeY), events)
  }

  test("X120/X121/X122/X129: vector family is partition-invariant") {
    same("x120", e => PowerIteration.powerIterationOf(e), emb)
    same("x121", e => RandIndex.agreementOf(
      Assign.centroidAssignOf(e).select(
        $"nearest_label".as("k"), $"label".as("c"))), emb)
    same("x122", e => Mmr.mmrOf(e), emb)
    same("x129", e => RobustRange.robustRangeOf(e), emb)
  }

  test("X128/X130/X131/X132: hygiene family is partition-invariant") {
    same("x128", d => Holdout.holdoutOf(
      d.select($"doc_id", $"source", $"text")), docs)
    same("x130", d => Distinctive.distinctiveTermsOf(d), docs)
    same("x131", d => Wilson.dupRateWilsonOf(d), docs)
    same("x132", d => PackSweep.packingSweepOf(d), docs)
  }
}
