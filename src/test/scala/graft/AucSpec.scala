package graft

import graft.ops.{Auc, CorpusIndex}

/** X106 — grouped exact AUC: hand-computed separations (perfect,
  * inverted, tied, one-class) and an exact driver-side replay of the
  * registered binding on the real corpus.
  */
class AucSpec extends SparkSpec {

  import spark.implicits._

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("grp") ->
      ((r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
        r.getAs[Long]("auc_num"), r.getAs[Long]("auc_den"),
        Option(r.getAs[java.lang.Double]("auc_q")).map(_.doubleValue)))).toMap

  private def scored(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("doc_id", "grp", "score")

  private def pos(ids: Long*) = ids.toSeq.toDF("doc_id")

  test("X106: perfect separation scores exactly 1, inverted exactly 0") {
    // grp g: positives {1,2} score 10,11; negatives {3,4} score 1,2
    val df = scored((1L, "g", 10L), (2L, "g", 11L), (3L, "g", 1L), (4L, "g", 2L),
      // grp h: positives at the BOTTOM
      (5L, "h", 1L), (6L, "h", 2L), (7L, "h", 10L), (8L, "h", 11L))
    val out = rowsOf(Auc.aucOf(df, pos(1L, 2L, 5L, 6L)))
    assert(out("g") == ((2L, 2L, 8L, 8L, Some(1.0))))
    assert(out("h") == ((2L, 2L, 0L, 8L, Some(0.0))))
  }

  test("X106: all-tied scores give exactly 1/2") {
    // 1 positive + 3 negatives all at score 7: every comparison is a
    // tie → 2U = n_pos*n_neg = 3, den = 6
    val df = scored((1L, "g", 7L), (2L, "g", 7L), (3L, "g", 7L), (4L, "g", 7L))
    val out = rowsOf(Auc.aucOf(df, pos(1L)))
    assert(out("g") == ((1L, 3L, 3L, 6L, Some(0.5))))
  }

  test("X106: mixed ties match the hand-computed rank sum") {
    // scores: pos {5, 3}, neg {3, 1}; ranks: 1→1, the two 3s → 2.5 each,
    // 5→4. 2R_pos = 2*(4 + 2.5) = 13; 2U = 13 - 2*3 = 7; den = 8
    val df = scored((1L, "g", 5L), (2L, "g", 3L), (3L, "g", 3L), (4L, "g", 1L))
    val out = rowsOf(Auc.aucOf(df, pos(1L, 2L)))
    assert(out("g") == ((2L, 2L, 7L, 8L, Some(0.875))))
  }

  test("X106: a one-class group yields NULL, not an 0/0 artifact") {
    val df = scored((1L, "g", 5L), (2L, "g", 7L))
    assert(rowsOf(Auc.aucOf(df, pos(1L, 2L)))("g") ==
      ((2L, 0L, 0L, 0L, None)))
    assert(rowsOf(Auc.aucOf(df, pos()))("g") == ((0L, 2L, 0L, 0L, None)))
  }

  test("X106: real corpus equals the exact integer replay") {
    val dup = CorpusIndex.ngramPairs(spark, sfDir)
      .select("doc_a", "doc_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).view.mapValues { ds =>
      val withPos = ds.map(d => (d._3, if (dup(d._1)) 1L else 0L))
      val nPos = withPos.map(_._2).sum
      val nNeg = withPos.length - nPos
      // 2×average-rank per score via the tie-group identity
      val groups = withPos.groupBy(_._1).toSeq.sortBy(_._1)
      var cum = 0L
      var twoRPos = 0L
      groups.foreach { case (_, g) =>
        val c = g.length.toLong
        val p = g.map(_._2).sum
        twoRPos += p * (2 * cum + c + 1)
        cum += c
      }
      val num = twoRPos - nPos * (nPos + 1)
      val den = 2 * nPos * nNeg
      (nPos, nNeg, num, den,
        if (den == 0) None else Some(num.toDouble / den.toDouble))
    }.toMap
    assert(rowsOf(Auc.lengthDupAuc(spark, sfDir)) == expected)
    // fixture guard: at least one lang has both classes (a real AUC)
    assert(expected.values.exists(_._5.isDefined))
  }
}
