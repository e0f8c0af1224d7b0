package graft

import graft.ops.RankDrift

/** X170 — Mann–Whitney rank drift: exact AUC endpoints (identical
  * distributions = ½, full dominance = 1/0), a hand-computed tie-heavy
  * case, the real corpus against an independent integer replay, and
  * partition invariance.
  */
class RankDriftSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_in"), r.getAs[Long]("n_rest"),
        r.getAs[Long]("u2"), r.getAs[Double]("auc")))).toMap

  private def frame(rows: (String, Long)*) =
    rows.toSeq.toDF("grp", "x")

  test("X170: identical in/rest distributions read exactly one half") {
    val out = rowsOf(RankDrift.rankDriftOf(frame(
      ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))))
    assert(out("a") == ((2L, 2L, 4L, 0.5)))
    assert(out("b") == ((2L, 2L, 4L, 0.5)))
  }

  test("X170: full dominance reads exactly 1 and exactly 0") {
    val out = rowsOf(RankDrift.rankDriftOf(frame(
      ("hi", 10L), ("hi", 20L), ("lo", 1L), ("lo", 2L))))
    assert(out("hi") == ((2L, 2L, 8L, 1.0)),
      "every hi value beats every lo value ⇒ u2 = 2·n_in·n_rest")
    assert(out("lo") == ((2L, 2L, 0L, 0.0)))
  }

  test("X170: hand-computed tie-heavy case (midranks via doubled sums)") {
    // a = {5, 5}, b = {5, 9}: block x=5 has c=3, cum=0; x=9 c=1, cum=3
    // 2·R_a = 2·(2·0+3+1) = 8 → u2_a = 8 − 2·3 = 2 → auc_a = 2/8 = 0.25
    // (exact midrank reading: both ties at rank 2, R_a = 4, U = 1)
    val out = rowsOf(RankDrift.rankDriftOf(frame(
      ("a", 5L), ("a", 5L), ("b", 5L), ("b", 9L))))
    assert(out("a") == ((2L, 2L, 2L, 0.25)))
    assert(out("b") == ((2L, 2L, 6L, 0.75)),
      "complementarity: auc_a + auc_b = 1 on a two-source corpus")
    // cleared tie-corrected variance (round-14 verdict item 5):
    // Σ(c³−c) = (27−3) + (1−1) = 24; var12_num = 5·4·3 − 24 = 36
    // ⇒ Var(U) = n_in·n_rest·36 / (12·4·3) = 4·36/144 = 1 exactly
    val vn = RankDrift.rankDriftOf(frame(
      ("a", 5L), ("a", 5L), ("b", 5L), ("b", 9L)))
      .select("var12_num").distinct().collect()
    assert(vn.map(_.getLong(0)).toSeq == Seq(36L),
      "one corpus-level cleared variance shared by every row")
  }

  test("X170: banded prefix sum spans band boundaries exactly") {
    // values straddle several W=1024 bands with gaps and ties — the
    // band offsets + within-band window must reproduce the global cum
    // a = {10, 5000}, b = {2000, 2000, 9000}: global sorted spine
    // 10(c1) 2000(c2) 5000(c1) 9000(c1); n=5
    // 2R_a = 1·(0+1+1) + 1·(2·3+1+1) = 2 + 8 = 10 → u2_a = 10 − 6 = 4
    // auc_a = 4 / (2·2·3) = 1/3
    val out = rowsOf(RankDrift.rankDriftOf(frame(
      ("a", 10L), ("a", 5000L), ("b", 2000L), ("b", 2000L), ("b", 9000L))))
    assert(out("a") == ((2L, 3L, 4L, 4.0 / 12.0)))
    // 2·midranks of b: 2000-block 2·2.5 = 5 (×2), 9000 2·5 = 10 →
    // 2R_b = 20 → u2_b = 20 − 3·4 = 8; complementarity u2_a+u2_b = 2·2·3
    assert(out("b")._3 == 8L)
    assert(out("a")._3 + out("b")._3 == 2L * 2L * 3L)
  }

  test("X170: a single-group corpus reads the defined half") {
    val out = rowsOf(RankDrift.rankDriftOf(frame(("a", 7L), ("a", 9L))))
    assert(out("a")._4 == 0.5, "empty rest ⇒ auc defined as 0.5")
  }

  test("X170: real corpus equals the exact integer replay") {
    val rows = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = rows.length.toLong
    // independent replay: sort values, midranks via doubled sums
    val blocks = rows.map(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val cum = blocks.scanLeft(0L)(_ + _._2).init
    val rank2 = blocks.zip(cum)
      .map { case ((x, c), cb) => x -> (2 * cb + c + 1) }.toMap
    val expected = rows.groupBy(_._1).view.mapValues { ds =>
      val nIn = ds.length.toLong
      val r2 = ds.map(d => rank2(d._2)).sum
      val u2 = r2 - nIn * (nIn + 1)
      (nIn, n - nIn, u2,
        if (nIn * (n - nIn) == 0) 0.5
        else u2.toDouble / (2.0 * (nIn * (n - nIn)).toDouble))
    }.toMap
    assert(rowsOf(RankDrift.rankDrift(spark, sfDir)) == expected)
    // the cleared variance against its independent BigInt replay
    val t3 = blocks.map { case (_, c) =>
      BigInt(c) * c * c - c }.sum
    val expectedVar = (BigInt(n) + 1) * n * (n - 1) - t3
    val got = RankDrift.rankDrift(spark, sfDir)
      .select("var12_num").distinct().collect().map(_.getLong(0)).toSeq
    assert(got == Seq(expectedVar.toLong))
  }

  test("X170: partition-count invariance") {
    val d = Tables.documents(spark, sfDir)
      .select($"source".as("grp"), $"n_chars".as("x"))
    val one = RankDrift.rankDriftOf(d).collect().map(_.toString).toSeq
    val many = RankDrift.rankDriftOf(d.repartition(13)).collect()
      .map(_.toString).toSeq
    assert(one == many)
  }
}
