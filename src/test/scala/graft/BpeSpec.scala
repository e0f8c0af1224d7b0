package graft

import graft.ops.Bpe

/** X110 — BPE merge induction: hand-traced merge chains (simple fuse,
  * overlap parity, merged-symbol reuse, tie-break, early exhaustion)
  * and a full driver-side reference trainer replay on the real corpus.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("round"),
      r.getAs[String]("lhs"), r.getAs[String]("rhs"),
      r.getAs[Long]("pair_freq"))).toList

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("X110: most frequent pair fuses first; merges chain across rounds") {
    // words: ab(2), ac(1) → r1 fuses (a,b,2); r2 only "ac" has a pair
    val out = rowsOf(Bpe.bpeMergesOf(docs("ab ab ac")))
    assert(out == List((1L, "a", "b", 2L), (2L, "a", "c", 1L)))
  }

  test("X110: overlap counts every position but merges leftmost-first") {
    // words: aaa(1), aa(1) → (a,a) counted 2+1 = 3; merging "aaa"
    // leftmost gives [aa, a], so round 2 fuses the NEW symbol ("aa","a")
    val out = rowsOf(Bpe.bpeMergesOf(docs("aaa aa")))
    assert(out == List((1L, "a", "a", 3L), (2L, "aa", "a", 1L)))
  }

  test("X110: argmax ties break on (lhs, rhs) ascending") {
    // (a,b) and (c,d) both weigh 1 → (a,b) first, (c,d) second
    val out = rowsOf(Bpe.bpeMergesOf(docs("ab cd")))
    assert(out.take(2) == List((1L, "a", "b", 1L), (2L, "c", "d", 1L)))
  }

  test("X110: exhausted corpora stop emitting, rounds degrade quietly") {
    // single-char words only: no adjacent pair in any round
    assert(rowsOf(Bpe.bpeMergesOf(docs("a b c"))) == Nil)
    // one mergeable pair: exactly one round emits
    assert(rowsOf(Bpe.bpeMergesOf(docs("ab a b"))) ==
      List((1L, "a", "b", 1L)))
  }

  /** Reference BPE trainer: word-freq table, overlap-counted pairs,
    * (freq DESC, lhs, rhs) argmax, leftmost-nonoverlap merge.
    */
  private def refTrain(wordFreq: Map[String, Long], rounds: Int)
      : List[(Long, String, String, Long)] = {
    var syms = wordFreq.map { case (w, f) => (w.split("").toList, f) }.toList
    val out = List.newBuilder[(Long, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (ss, f) =>
        ss.zip(ss.drop(1)).foreach(p =>
          counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val ((l, rr), c) = counts.minBy { case ((l, rr), c) => (-c, l, rr) }
        out += ((r.toLong, l, rr, c))
        syms = syms.map { case (ss, f) =>
          val b = List.newBuilder[String]
          var rest = ss
          while (rest.nonEmpty) rest match {
            case a :: bsym :: tail if a == l && bsym == rr =>
              b += (l + rr); rest = tail
            case a :: tail => b += a; rest = tail
            case Nil =>
          }
          (b.result(), f)
        }
      }
    }
    out.result()
  }

  test("X110: real corpus equals the reference trainer") {
    val wordFreq = Tables.documents(spark, sfDir)
      .select("text").collect()
      .flatMap(_.getString(0).toLowerCase.trim.split("\\s+"))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = refTrain(wordFreq, Bpe.Rounds)
    assert(rowsOf(Bpe.bpeMerges(spark, sfDir)) == expected)
    assert(expected.size == Bpe.Rounds) // fixture guard: all rounds fire
  }
}
