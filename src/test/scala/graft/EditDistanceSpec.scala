package graft

import graft.ops.EditDistance

/** X118 — FastSS k≤2 deletion-neighborhood join: each edit kind found,
  * distance-2 combinations found, far pairs sharing a variant rejected
  * by the verify stage, and engine ≡ naive all-pairs replay on the
  * real top-V vocabulary.
  */
class EditDistanceSpec extends SparkSpec {

  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[String]("word_a"),
      r.getAs[String]("word_b")) -> r.getAs[Long]("lev")).toMap

  private def vocab(words: String*) =
    words.zipWithIndex.map { case (w, i) => (w, (100 - i).toLong) }
      .toDF("word", "cnt")

  test("X118: finds each single-edit kind at distance 1") {
    val out = pairsOf(EditDistance.edit2JoinOf(vocab(
      "color", "colour", // insertion
      "bed", "bud",      // substitution
      "cats")))          // unrelated to the others at ≤2? see below
    assert(out(("color", "colour")) == 1L)
    assert(out(("bed", "bud")) == 1L)
    assert(!out.contains(("bud", "cats")))
  }

  test("X118: finds distance-2 combinations") {
    val out = pairsOf(EditDistance.edit2JoinOf(vocab(
      "part", "sort",   // two substitutions
      "spark")))        // part→spark: insert s, subst t? lev=2
    assert(out(("part", "sort")) == 2L)
    assert(out(("part", "spark")) == 2L)
    assert(!out.contains(("sort", "spark"))) // lev = 3
  }

  test("X118: far pairs sharing a deletion variant are rejected") {
    // del2(abcd) ∋ "ab","cd"; del2(cdab) ∋ "cd","ab" — shared variants
    // but lev = 4: the verify stage must drop it.
    val out = pairsOf(EditDistance.edit2JoinOf(vocab("abcd", "cdab")))
    assert(out.isEmpty)
  }

  test("X118: pair order is canonical and duplicates collapse") {
    val out = pairsOf(EditDistance.edit2JoinOf(vocab("same", "tame")))
    assert(out.keySet == Set(("same", "tame"))) // many shared variants, one row
    out.keySet.foreach { case (a, b) => assert(a < b) }
  }

  test("X118: real vocabulary equals the naive all-pairs replay") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Tables.documents(spark, sfDir)
      .selectExpr("explode(split(lower(text), '\\\\s+')) AS word")
      .where("word rlike '^[a-z0-9]+$' and length(word) between 3 and 20")
      .groupBy("word").count()
      .orderBy($"count".desc, $"word").limit(EditDistance.V)
      .collect().map(_.getString(0))
    val expected = (for {
      a <- words; b <- words
      if a < b && lev(a, b) <= 2
    } yield (a, b) -> lev(a, b).toLong).toMap
    val got = pairsOf(EditDistance.edit2TokenJoin(spark, sfDir))
    assert(got == expected)
    assert(got.nonEmpty) // the corpus does contain edit-2 variants
  }
}
