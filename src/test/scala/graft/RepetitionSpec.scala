package graft

import graft.ops.Repetition

/** X27 — intra-doc repetition stats: hand-computed planted cases plus a
  * brute-force cross-check of every metric over the real corpus.
  */
class RepetitionSpec extends SparkSpec {

  private def statsFor(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    Repetition.repetitionOf(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("X27: planted repetition cases match hand computation") {
    val m = statsFor(Seq(
      1L -> "a a a a a",          // total word+gram repetition
      2L -> "one two three four", // no repetition at all
      3L -> "x y x y x y",        // repeated phrase: dup bigram mass 4/5
      4L -> "solo"))              // single token: no grams, never flagged

    val r1 = m(1L)
    assert(r1.getAs[Long]("n_tokens") == 5 && r1.getAs[Long]("n_distinct_words") == 1)
    assert(r1.getAs[Long]("n_grams2") == 4 && r1.getAs[Long]("n_distinct_grams2") == 1)
    assert(r1.getAs[Long]("n_grams3") == 3 && r1.getAs[Long]("n_distinct_grams3") == 1)
    assert(r1.getAs[Double]("dup_gram2_frac") == 0.75 && r1.getAs[Int]("repetitive") == 1)

    val r2 = m(2L)
    assert(r2.getAs[Long]("n_distinct_grams2") == 3 && r2.getAs[Long]("n_grams2") == 3)
    assert(r2.getAs[Double]("dup_gram2_frac") == 0.0 && r2.getAs[Int]("repetitive") == 0)

    val r3 = m(3L)
    // grams2 = [x y, y x, x y, y x, x y] → 5 total, 2 distinct
    assert(r3.getAs[Long]("n_grams2") == 5 && r3.getAs[Long]("n_distinct_grams2") == 2)
    assert(r3.getAs[Double]("dup_gram2_frac") == 0.6 && r3.getAs[Int]("repetitive") == 1)

    val r4 = m(4L)
    assert(r4.getAs[Long]("n_tokens") == 1 && r4.getAs[Long]("n_grams2") == 0)
    assert(r4.getAs[Long]("n_grams3") == 0)
    assert(r4.getAs[Double]("dup_gram2_frac") == 0.0 && r4.getAs[Int]("repetitive") == 0)
  }

  test("X27: native RepetitionCounts is bit-equal to the lambda reference form") {
    import spark.implicits._
    // the real corpus plus the planted edge cases (single token, total
    // repetition, empty-ish text)
    val edge = Seq(900001L -> "solo", 900002L -> "a a a a a", 900003L -> " ")
      .toDF("doc_id", "text")
    val docs = Tables.documents(spark, sfDir).select($"doc_id", $"text")
      .unionByName(edge)
    val native = Repetition.repetitionOf(docs).collect().map(_.toString).toSeq
    val lambda = Repetition.repetitionOfLambda(docs).collect().map(_.toString).toSeq
    assert(native.nonEmpty && native == lambda)
  }

  test("X27: repetition_counts is SQL-registered") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT repetition_counts(array('x','y','x','y','x')) AS c").head()
    assert(r.getSeq[Long](0).toSeq == Seq(5L, 2L, 4L, 2L, 3L, 2L))
  }

  test("X27: every metric matches a brute-force recompute on the corpus") {
    val docs = Tables.documents(spark, sfDir)
      .selectExpr("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = Repetition.repetitionStats(spark, sfDir).collect()
    assert(got.length == docs.size && got.nonEmpty)
    got.foreach { r =>
      val words = docs(r.getAs[Long]("doc_id")).trim.toLowerCase
        .split("\\s+").toSeq
      def g(n: Int) = if (words.size >= n) words.sliding(n).map(_.mkString(" ")).toSeq else Nil
      assert(r.getAs[Long]("n_tokens") == words.size)
      assert(r.getAs[Long]("n_distinct_words") == words.distinct.size)
      assert(r.getAs[Long]("n_grams2") == g(2).size)
      assert(r.getAs[Long]("n_distinct_grams2") == g(2).distinct.size)
      assert(r.getAs[Long]("n_grams3") == g(3).size)
      assert(r.getAs[Long]("n_distinct_grams3") == g(3).distinct.size)
      val dup2 = g(2).size - g(2).distinct.size
      val expFrac = if (g(2).nonEmpty) dup2.toDouble / g(2).size else 0.0
      assert(r.getAs[Double]("dup_gram2_frac") == expFrac)
      val flag = dup2 * 5 > g(2).size || (words.size - words.distinct.size) * 2 > words.size
      assert(r.getAs[Int]("repetitive") == (if (flag) 1 else 0))
    }
  }
}
