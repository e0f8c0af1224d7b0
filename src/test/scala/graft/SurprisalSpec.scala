package graft

import graft.ops.Surprisal

/** X98 — integer bigram surprisal: hand-priced fixture covering all
  * three cost cases (modeled bigram, unigram back-off, full OOV) and an
  * exact driver-side replay on the real corpus.
  */
class SurprisalSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("total_bits"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("bits_per_bigram")))).toMap

  test("X98: modeled, backed-off, and OOV bigrams price correctly") {
    // en model from doc 1 "a b a b c": B = {ab:2, ba:1, bc:1},
    // U (bigram-start counts) = {a:2, b:2}; bitlen(2)=2, bitlen(1)=1.
    //  doc 1: ab×2 → 2−2=0 each; ba → 2−1=1; bc → 2−1=1. total 2.
    //  doc 2 "a b z q": ab → 0; bz → back-off bitlen(U(b))=2;
    //                   zq → OOV 24. total 26, one OOV.
    //  doc 3 "b a": ba → 1.
    val docs = Seq(
      (1L, "en", "a b a b c"),
      (2L, "de", "a b z q"),
      (3L, "fr", "b a")).toDF("doc_id", "lang", "text")
    val got = rowsOf(Surprisal.surprisalOf(docs, "en"))
    assert(got(1L) == ((4L, 2L, 0L, 0.5)))
    assert(got(2L) == ((3L, 26L, 1L, 26.0 / 3.0)))
    assert(got(3L) == ((1L, 1L, 0L, 1.0)))
  }

  test("X98: real corpus equals the exact integer replay") {
    def bitlen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)
    val rows = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "lang", "trim(lower(text)) as t").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split("\\s+").toSeq))
    val refBigrams = rows.filter(_._2 == Surprisal.RefLang)
      .flatMap(r => r._3.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val bgm = refBigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ugm = refBigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val expected = rows.flatMap { case (id, _, toks) =>
      val bgs = toks.sliding(2).filter(_.size == 2)
        .map(p => (p(0), p(1))).toSeq
      if (bgs.isEmpty) None else {
        val bits = bgs.map { bg =>
          bgm.get(bg) match {
            case Some(bc) => bitlen(ugm(bg._1)) - bitlen(bc)
            case None => ugm.get(bg._1)
              .map(bitlen).getOrElse(Surprisal.OovBits)
          }
        }
        val oov = bgs.count(bg =>
          !bgm.contains(bg) && !ugm.contains(bg._1)).toLong
        Some(id -> ((bgs.size.toLong, bits.sum, oov,
          bits.sum.toDouble / bgs.size)))
      }
    }.toMap
    assert(rowsOf(Surprisal.surprisal(spark, sfDir)) == expected)
  }
}
