package graft

import org.apache.spark.sql.functions._

import graft.functions.Hashing.{cosQ, dotQ}
import graft.ops.LloydIvf

/** X166 — integer-exact Lloyd-trained IVF: training converges on a
  * separable fixture (mis-seeded labels heal), the trained assignment
  * is the argmin fixpoint w.r.t. the final centroids, the probe's
  * recall clears a floor against the brute-force top-k, and the
  * registered query equals the seam identity.
  */
class LloydIvfSpec extends SparkSpec {

  import spark.implicits._

  test("X166: mis-seeded labels heal into the separable blobs") {
    // two tight blobs on orthogonal axes; a QUARTER of each blob seeded
    // with the WRONG label (a minority — a half/half mis-seed would
    // make the two seed centroids identical and the problem degenerate)
    // — T Lloyd rounds must land every vector with its geometric blob
    val vecs = (0 until 40).map { i =>
      val blob = i % 2                          // true geometry
      val seed = if (i < 30) blob else 1 - blob // quarter mis-seeded
      val base = if (blob == 0) Array(1.0f, 0.0f, 0.1f * (i % 5))
                 else Array(0.0f, 1.0f, 0.1f * (i % 5))
      (i.toLong, seed.toLong, base)
    }.toDF("vec_id", "label", "embedding")
    val idx = LloydIvf.buildLloydIndexOf(vecs, LloydIvf.T)
    val cells = idx.assigned.select($"vec_id", $"cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val blob0cells = (0 until 40).filter(_ % 2 == 0).map(i => cells(i.toLong)).distinct
    val blob1cells = (0 until 40).filter(_ % 2 == 1).map(i => cells(i.toLong)).distinct
    assert(blob0cells.length == 1 && blob1cells.length == 1,
      "each geometric blob must land in exactly one trained cell")
    assert(blob0cells.head != blob1cells.head,
      "the two blobs must not collapse into one cell")
  }

  test("X166: the trained assignment is the argmin fixpoint of the " +
    "final centroids") {
    val idx = LloydIvf.lloydIndex(spark, sfDir)
    // recompute each vector's nearest final centroid independently and
    // compare with the stored cell — the E-step definition itself
    val re = idx.assigned.crossJoin(broadcast(idx.centroids))
      .select($"vec_id", $"cell",
        (dotQ($"embedding", $"embedding")
          - lit(2.0) * dotQ($"embedding", $"c")
          + dotQ($"c", $"c")).as("dist_q"), $"c_cell")
      .groupBy($"vec_id", $"cell")
      .agg(min(struct($"dist_q", $"c_cell")).as("best"))
      .filter($"cell" =!= $"best.c_cell")
    assert(re.count() == 0L,
      "every stored cell must be the argmin against the final centroids")
  }

  test("X166: probe recall clears the floor vs brute-force cosine top-5") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter($"vec_id" < LloydIvf.NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        dotQ($"embedding", $"embedding").as("qnq"))
    val byQuery = org.apache.spark.sql.expressions.Window
      .partitionBy($"query_id").orderBy($"cos_sim".desc, $"vec_id".asc)
    val truth = e.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        cosQ(dotQ($"embedding", $"qe"),
          dotQ($"embedding", $"embedding"), $"qnq").as("cos_sim"))
      .withColumn("rnk", row_number().over(byQuery))
      .filter($"rnk" <= 5)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = LloydIvf.ivfLloydTopK(spark, sfDir)
      .select($"query_id", $"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (got & truth).size.toDouble / truth.size
    assert(recall >= 0.2,
      s"nprobe=${LloydIvf.NProbe} trained-IVF recall@5 fell to $recall")
  }

  test("X166: registered query equals the seam identity and is shaped") {
    val rows = SparkEntry.queries("x166_ivf_lloyd_topk")(spark, sfDir)
      .collect()
    assert(rows.length == LloydIvf.NQueries * 5,
      "exactly top-5 per fixed query")
    rows.foreach { r =>
      val rnk = r.getAs[Int]("rnk")
      assert(rnk >= 1 && rnk <= 5)
      val cs = r.getAs[Double]("cos_sim")
      assert(cs >= -1.0 - 1e-9 && cs <= 1.0 + 1e-9)
    }
    val seam = LloydIvf.probe(LloydIvf.lloydIndex(spark, sfDir))
      .collect().map(_.toString).toSeq
    assert(rows.map(_.toString).toSeq == seam)
  }
}
