package graft

import org.apache.spark.sql.functions._

import graft.ops.{RecallAudit, Vector => GVector}
import graft.functions.Hashing

/** X100 — ANN recall audit: fixture truth tables for the audit join
  * (identical, disjoint, partial lists) and a driver-side replay of the
  * whole audit on the real embeddings.
  */
class RecallAuditSpec extends SparkSpec {

  import spark.implicits._

  private def list(rows: (Long, Long)*) =
    rows.toDF("query_id", "vec_id")

  private def rowsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("query_id") ->
      ((r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"),
        r.getAs[Double]("recall")))).toMap

  test("X100: identical lists audit at recall 1, disjoint at 0") {
    val exact = list(0L -> 10L, 0L -> 11L, 1L -> 20L, 1L -> 21L)
    assert(rowsOf(RecallAudit.recallOf(exact, exact)) ==
      Map(0L -> ((2L, 2L, 1.0)), 1L -> ((2L, 2L, 1.0))))
    val miss = list(0L -> 90L, 0L -> 91L, 1L -> 92L, 1L -> 93L)
    assert(rowsOf(RecallAudit.recallOf(exact, miss)) ==
      Map(0L -> ((2L, 0L, 0.0)), 1L -> ((2L, 0L, 0.0))))
  }

  test("X100: partial overlap counts hits per query, not globally") {
    val exact = list(0L -> 10L, 0L -> 11L, 1L -> 10L, 1L -> 21L)
    // approx has 0's 10 and 1's 21; 1's 10 is a DIFFERENT query's hit
    val approx = list(0L -> 10L, 1L -> 21L, 1L -> 99L)
    assert(rowsOf(RecallAudit.recallOf(exact, approx)) ==
      Map(0L -> ((2L, 1L, 0.5)), 1L -> ((2L, 1L, 0.5))))
  }

  test("X100: real audit equals the driver-side replay") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" < 3)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val exact = GVector.rerankTop5(e.crossJoin(broadcast(q))
        .filter($"vec_id" =!= $"query_id")
        .select($"query_id", $"vec_id",
          Hashing.cosQ(Hashing.dotQ($"embedding", $"qe"),
            Hashing.dotQ($"embedding", $"embedding"),
            Hashing.dotQ($"qe", $"qe")).as("cos_sim")))
      .select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val approx = GVector.annLshTopK(spark, sfDir)
      .select($"query_id", $"vec_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val expected = exact.map { case (qid, ex) =>
      val hit = ex.intersect(approx.getOrElse(qid, Set.empty)).size.toLong
      qid -> ((ex.size.toLong, hit, hit.toDouble / ex.size))
    }
    assert(rowsOf(RecallAudit.annRecallAudit(spark, sfDir)) == expected)
    // well-formed: full-depth ground truth, recall within bounds (the
    // VALUE is data — a tiny corpus legitimately audits low)
    assert(expected.values.forall(v => v._1 == 5L && v._3 >= 0.0 && v._3 <= 1.0))
    info(s"measured recall@5 per query: " +
      expected.toSeq.sortBy(_._1).map(v => f"${v._2._3}%.1f").mkString(", "))
  }
}
