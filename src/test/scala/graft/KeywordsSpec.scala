package graft

import graft.ops.Keywords

/** X104 — per-doc top-k keywords: hand-scored fixtures (whole-bit idf,
  * stopword zeroing, word-order ties, short docs) and a full driver-side
  * replay on the real corpus.
  */
class KeywordsSpec extends SparkSpec {

  import spark.implicits._

  private def bitlen(x: Long): Long = 64 - java.lang.Long.numberOfLeadingZeros(x)

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("rk")) ->
      ((r.getAs[String]("word"), r.getAs[Long]("score")))).toMap

  test("X104: whole-bit idf ranks rare-but-repeated terms first") {
    // 4 docs; "zz" only in doc 0 (df=1): idf = bitlen(4)-bitlen(1) = 2
    // "the" in all 4 (df=4): idf = 3-3 = 0 — suppressed even at tf=3
    // "aa" in 2 docs (df=2): idf = 3-2 = 1
    val docs = Seq(
      (0L, "the the the zz aa aa"),
      (1L, "the aa"),
      (2L, "the bb"),
      (3L, "the bb")).toDF("doc_id", "text")
    val out = rowsOf(Keywords.topKeywordsOf(docs))
    // doc 0: zz 1*2=2, aa 2*1=2 — tie at 2, word asc → aa first; the 0
    assert(out((0L, 1L)) == (("aa", 2L)))
    assert(out((0L, 2L)) == (("zz", 2L)))
    assert(out((0L, 3L)) == (("the", 0L)))
    // doc 1: aa 1, the 0 — only two distinct words → two rows
    assert(out((1L, 1L)) == (("aa", 1L)))
    assert(out((1L, 2L)) == (("the", 0L)))
    assert(!out.contains((1L, 3L)))
  }

  test("X104: real corpus equals the exact replay") {
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).toLowerCase.trim.split("\\s+").toSeq)
    val n = texts.length.toLong
    val tf = texts.map { case (id, ws) =>
      id -> ws.groupBy(identity).view.mapValues(_.size.toLong).toMap }
    val df = tf.flatMap(_._2.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val expected = tf.flatMap { case (id, m) =>
      m.toSeq
        .map { case (w, t) => (w, t * (bitlen(n) - bitlen(df(w)))) }
        .sortBy { case (w, s) => (-s, w) }
        .take(Keywords.K).zipWithIndex
        .map { case ((w, s), i) => (id, i + 1L) -> ((w, s)) }
    }.toMap
    assert(rowsOf(Keywords.topKeywords(spark, sfDir)) == expected)
  }
}
