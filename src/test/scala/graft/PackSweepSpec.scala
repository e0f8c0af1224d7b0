package graft

import graft.ops.{PackSweep, Packing}

/** X132 — packing sweep: hand-computed straddle/pack/waste counts, the
  * capacity-independence of the underlying layout, monotonicity of
  * straddlers in 1/capacity on the real corpus, and an exact replay.
  */
class PackSweepSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("capacity") ->
      ((r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("n_packs"), r.getAs[Long]("tail_waste"),
        r.getAs[Long]("n_straddlers")))).toMap

  test("X132: hand-computed sweep on a three-doc layout") {
    // docs of 200, 100, 300 tokens → offsets 0, 200, 300; T = 600
    // c=256: doc1 [0,199] in pack0; doc2 [200,299] straddles 255|256;
    //        doc3 [300,599] straddles 511|512 → 2 straddlers,
    //        packs = 3, waste = 768-600 = 168
    // c=512: doc3 [300,599] straddles → 1; packs = 2, waste = 424
    val docs = Seq(
      (1L, Seq.fill(200)("w").mkString(" ")),
      (2L, Seq.fill(100)("w").mkString(" ")),
      (3L, Seq.fill(300)("w").mkString(" "))).toDF("doc_id", "text")
    val out = rowsOf(PackSweep.packingSweepOf(docs))
    assert(out(256L) == ((3L, 600L, 3L, 168L, 2L)))
    assert(out(512L) == ((3L, 600L, 2L, 424L, 1L)))
    assert(out(1024L) == ((3L, 600L, 1L, 424L, 0L)))
    assert(out(2048L) == ((3L, 600L, 1L, 1448L, 0L)))
  }

  test("X132: straddlers never increase with capacity (real corpus)") {
    val out = rowsOf(PackSweep.packingSweep(spark, sfDir))
    val byCap = PackSweep.Capacities.map(c => out(c)._5)
    assert(byCap == byCap.sorted.reverse)
    // totals are capacity-invariant
    assert(out.values.map(v => (v._1, v._2)).toSet.size == 1)
  }

  test("X132: real corpus equals the exact offset replay") {
    val layout = Packing.packingOf(
        Tables.documents(spark, sfDir), 2048L)
      .select("doc_id", "n_tokens", "start_offset").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val t = layout.map(_._1).sum
    val expected = PackSweep.Capacities.map { c =>
      val straddlers = layout.count { case (n, s) =>
        n >= 1 && s / c != (s + n - 1) / c }.toLong
      val packs = (t + c - 1) / c
      c -> ((layout.length.toLong, t, packs, packs * c - t, straddlers))
    }.toMap
    assert(rowsOf(PackSweep.packingSweep(spark, sfDir)) == expected)
  }
}
