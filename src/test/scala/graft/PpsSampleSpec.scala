package graft

import org.apache.spark.sql.functions._

import graft.ops.PpsSample
import graft.functions.Hashing

/** X97 — weighted systematic sampling: pick-mass conservation, the
  * certainty-inclusion property for over-stride docs, invariance of the
  * decomposed prefix sum under input repartition, and an exact
  * driver-side replay of the whole ledger on the real corpus.
  */
class PpsSampleSpec extends SparkSpec {

  import spark.implicits._

  private def ledger(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("start_w"), r.getAs[Long]("n_picks"),
      r.getAs[Boolean]("selected"))).toSeq

  test("X97: total picks equal ceil(total_weight / stride) exactly") {
    val got = PpsSample.ppsSample(spark, sfDir)
    val (w, p) = got.agg(sum($"n_tokens"), sum($"n_picks"))
      .as[(Long, Long)].collect()(0)
    assert(p == (w + PpsSample.Stride - 1) / PpsSample.Stride,
      s"total weight $w, picks $p")
  }

  test("X97: a doc heavier than k strides gets at least k picks") {
    // 600 tokens at stride 256 spans ≥ 2 pick positions wherever the
    // hash order places it; the two 5-token docs can get at most 1
    val docs = Seq(
      (1L, Seq.fill(600)("t").mkString(" ")),
      (2L, "a a a a a"), (3L, "b b b b b")).toDF("doc_id", "text")
    val got = ledger(PpsSample.ppsSampleOf(docs, 256L)).map(r => r._1 -> r).toMap
    assert(got(1L)._4 >= 2 && got(1L)._5)
    assert(got(2L)._4 <= 1 && got(3L)._4 <= 1)
    assert(got.values.map(_._4).sum == (610 + 255) / 256)
  }

  test("X97: the ledger is invariant to input partitioning") {
    val docs = Tables.documents(spark, sfDir)
    val base = ledger(PpsSample.ppsSampleOf(docs, PpsSample.Stride))
    val shuffled = ledger(PpsSample.ppsSampleOf(
      docs.repartition(7, $"lang"), PpsSample.Stride))
    assert(base == shuffled)
  }

  test("X97: real corpus equals the exact driver-side replay") {
    val rows = Tables.documents(spark, sfDir)
      .select($"doc_id",
        size(split(trim(lower($"text")), "\\s+")).cast("long").as("w"),
        Hashing.md5Long40(concat(lit("x97|"), $"doc_id".cast("string")))
          .as("h"))
      .as[(Long, Long, Long)].collect()
    val s = PpsSample.Stride
    var cum = 0L
    val expected = rows.sortBy(r => (r._3, r._1)).map { case (id, w, _) =>
      val start = cum
      cum += w
      val picks = (start + w + s - 1) / s - (start + s - 1) / s
      (id, w, start, picks, picks > 0)
    }.sortBy(_._1).toSeq
    assert(ledger(PpsSample.ppsSample(spark, sfDir)) == expected)
  }
}
