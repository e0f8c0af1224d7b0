package graft

import graft.ops.{Containment, CorpusIndex, PrefixJoin, ScaleCaps}

/** The scale-posture seam for the lossless near-dup joins (round-10
  * verdict item 2): x62/x63's REGISTERED queries read their candidate
  * cap from [[ops.ScaleCaps]] (env `SPARK_GRAFT_MAX_CAND_DF` / JVM
  * property `graft.maxCandDf`) instead of hard-coding the lossless
  * `Long.MaxValue` — so a cluster deployment declares the capped
  * posture with one submit-time setting while the unset default stays
  * bit-equal to the lossless form the oracles gate.
  */
class CapSeamSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  test("unset seam: registered x62/x63 are bit-equal to the lossless form") {
    sys.props.remove("graft.maxCandDf")
    assert(ScaleCaps.maxCandDf == Long.MaxValue)
    val tok = CorpusIndex.shingles(spark, sfDir)
    assert(rows(SparkEntry.queries("x62_setsim_prefix_join")(spark, sfDir))
      == rows(PrefixJoin.prefixSimJoinSh(tok, Long.MaxValue)))
    assert(rows(SparkEntry.queries("x63_containment_join")(spark, sfDir))
      == rows(Containment.containmentJoinSh(tok, Long.MaxValue)))
  }

  test("set seam: registered x62/x63 run the capped candidate join") {
    // cap low enough to bite at sf0.001 — proves the REGISTERED query
    // (not just the seam method) responds to the posture setting
    sys.props("graft.maxCandDf") = "3"
    try {
      val tok = CorpusIndex.shingles(spark, sfDir)
      assert(rows(SparkEntry.queries("x62_setsim_prefix_join")(spark, sfDir))
        == rows(PrefixJoin.prefixSimJoinSh(tok, 3L)))
      assert(rows(SparkEntry.queries("x63_containment_join")(spark, sfDir))
        == rows(Containment.containmentJoinSh(tok, 3L)))
      // and the capped candidate stream is a strict subset of lossless
      val capped = PrefixJoin.candidatesSh(tok, 3L).count()
      val lossless = PrefixJoin.candidatesSh(tok, Long.MaxValue).count()
      assert(capped <= lossless)
    } finally sys.props.remove("graft.maxCandDf")
  }
}
